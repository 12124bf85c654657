r"""Sharded Monte-Carlo objective: propagate + fidelity + pmean over the mesh.

The disorder-averaged fidelity is the framework's inner loop; on a mesh it is
computed with ``shard_map`` so each device runs the (Pallas or XLA) propagator
on its local ``(B/d, M/m)`` block and the expectation reduces over ICI with
``jax.lax.pmean`` — the TPU-native replacement for the reference's
``repeat_interleave``-then-mean on one GPU (universal_model_trainer.py:80-88).

Differentiable end-to-end (shard_map transposes pmean correctly), so the same
function serves training and evaluation.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core import propagate as xla_prop
from ..core.su2 import quat_fidelity
from ..ops.propagate_pallas import mean_fidelity_pallas
from .mesh import DATA_AXIS, MC_AXIS

__all__ = ["make_mean_fidelity", "mean_fidelity_local"]


def mean_fidelity_local(pulses: jax.Array, q_target: jax.Array,
                        delta: jax.Array, eps: jax.Array,
                        backend: str = "xla") -> jax.Array:
    """Per-target mean fidelity ``(B,)`` on local (unsharded) arrays."""
    if backend == "pallas":
        return mean_fidelity_pallas(pulses, q_target, delta, eps)
    method = "scan_remat" if backend == "xla_remat" else "scan"
    q = xla_prop.propagate_mc(pulses, delta, eps, method=method)
    return jnp.mean(quat_fidelity(q, q_target[:, None, :]), axis=1)


def make_mean_fidelity(mesh: Optional[Mesh] = None, backend: str = "xla"):
    """Build ``mean_fid(pulses, q_target, delta, eps) -> scalar E[F]``.

    Without a mesh: plain local computation.  With a mesh: shard_map with
    pulses/targets sharded over ``data``, disorder over ``(data, mc)``, and a
    global pmean so every device holds the same scalar.
    """
    if mesh is None:
        def mean_fid(pulses, q_target, delta, eps):
            return jnp.mean(mean_fidelity_local(pulses, q_target, delta, eps,
                                                backend))
        return mean_fid

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS, MC_AXIS),
                  P(DATA_AXIS, MC_AXIS)),
        out_specs=P(),
        check_vma=False,  # pallas_call out_shapes carry no vma annotations
    )
    def _sharded(pulses, q_target, delta, eps):
        f_local = mean_fidelity_local(pulses, q_target, delta, eps, backend)
        return jax.lax.pmean(jnp.mean(f_local), (DATA_AXIS, MC_AXIS))

    return _sharded
