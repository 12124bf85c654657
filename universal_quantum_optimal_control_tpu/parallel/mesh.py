r"""Device mesh construction and sharding helpers.

The reference is strictly single-device (``"cuda" if available else "cpu"`` —
universal_model_trainer.py:35; SCORE.py:298).  Here scale-out is first-class:
a 2D logical mesh ``("data", "mc")`` shards the target batch over ``data``
and the Monte-Carlo disorder axis over ``mc``; fidelity expectations and
gradients reduce over ICI with ``psum``/``pmean`` inside ``shard_map``
(SURVEY.md §2.3/§2.4).

Runs unchanged on 1 device (trivial mesh) and on a virtual CPU mesh in tests.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "DATA_AXIS", "MC_AXIS", "replicated", "shard_spec",
           "init_distributed"]


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX (DCN) — call once per host before any
    device use on multi-host pods.  After this, :func:`make_mesh` sees the
    global device set; keep the ``mc`` axis within-host (ICI) and let
    embarrassingly parallel work (curriculum bands, σ-sweep points —
    SURVEY.md §2.3) ride ``data`` across hosts.

    No-op on single-host (all arguments None and JAX already local).
    """
    if coordinator_address is None and num_processes is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )

DATA_AXIS = "data"
MC_AXIS = "mc"


def make_mesh(
    n_devices: Optional[int] = None,
    data: Optional[int] = None,
    mc: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, mc)`` mesh over the available devices.

    With only ``n_devices`` given, the factorization favors the MC axis
    (disorder sampling is the dominant scale axis — SURVEY.md §2.3): data
    gets the largest power-of-two ≤ √n, mc the rest.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)

    if data is None and mc is None:
        data = 2 ** int(math.log2(max(int(math.sqrt(n)), 1)))
        while n % data != 0:
            data //= 2
        mc = n // data
    elif data is None:
        data = n // mc
    elif mc is None:
        mc = n // data
    if data * mc != n:
        raise ValueError(f"mesh {data}x{mc} != {n} devices")

    dev_array = np.asarray(devs).reshape(data, mc)
    return Mesh(dev_array, (DATA_AXIS, MC_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_spec(mesh: Mesh, *axes) -> NamedSharding:
    """NamedSharding over the given logical axes (None for replicated dims)."""
    return NamedSharding(mesh, P(*axes))
