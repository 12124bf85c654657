"""Test configuration: run everything on a virtual 8-device CPU mesh.

A pytest plugin imports jax before this conftest loads, so env vars are too
late — but the backend is initialized lazily, so ``jax.config.update`` still
selects the platform and virtual device count.

A persistent XLA compilation cache lives in ``.pytest_cache/jax`` — the
quick tier is jit-compile-dominated on one CPU core, and warm-cache reruns
skip every unchanged compile (README.md §Test tiers records the measured
cold/warm wall-clocks).  ``UQOC_NO_JAX_CACHE=1`` disables it (e.g. when
bisecting a compiler-level issue).
"""

import os
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
# silence XLA:CPU's AOT-loader machine-feature E-log lines (the cache tags
# executables with compile-flag pseudo-features like +prefer-no-scatter;
# the load still succeeds) — must be set before jaxlib initializes logging
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

if not os.environ.get("UQOC_NO_JAX_CACHE"):
    _cache = Path(__file__).parent.parent / ".pytest_cache" / "jax"
    jax.config.update("jax_compilation_cache_dir", str(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
