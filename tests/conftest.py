"""Test configuration: run everything on a virtual 8-device CPU mesh.

A pytest plugin imports jax before this conftest loads, so env vars are too
late — but the backend is initialized lazily, so ``jax.config.update`` still
selects the platform and virtual device count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
