r"""Quantum system abstractions for the trainer.

The reference injects ``unitary_generator`` / ``error_sampler`` /
``fidelity_fn`` callables into its trainer (universal_model_trainer.py:27-35).
Here that contract is a small typed object: a *system* knows how to sample
its disorder channels and how to score a pulse batch against targets — so the
same curriculum trainer drives single-qubit (quaternion/Pallas paths) and
two-qubit (SU(4) real-imag paths) workloads, sharded or not.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core import su4 as su4_mod
from ..core.errors import sample_ore_ple
from ..parallel.mc_parallel import mean_fidelity_local
from ..parallel.mesh import DATA_AXIS, MC_AXIS

__all__ = ["SU2System", "SU4System", "make_objective",
           "make_per_target_objective"]


def make_objective(mesh: Optional[Mesh], local_fn):
    """Lift ``local_fn(pulses, target, errors) -> (B_local,)`` per-target mean
    fidelities into a global scalar objective, sharding over the mesh when
    given (pulses/targets over ``data``, disorder over ``(data, mc)``,
    pmean over ICI)."""
    if mesh is None:
        def objective(pulses, target, errors):
            return jnp.mean(local_fn(pulses, target, errors))
        return objective

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS, MC_AXIS)),
        out_specs=P(),
        check_vma=False,  # pallas_call out_shapes carry no vma annotations
    )
    def objective(pulses, target, errors):
        f_local = local_fn(pulses, target, errors)
        return jax.lax.pmean(jnp.mean(f_local), (DATA_AXIS, MC_AXIS))

    return objective


def make_per_target_objective(mesh: Optional[Mesh], local_fn):
    """Like :func:`make_objective` but returns the per-target ``(B,)`` mean
    fidelities instead of the batch-mean scalar — the input a tail-focused
    (CVaR) loss needs (``TrainConfig.tail_focus``).  On a mesh the MC axis is
    pmean-reduced and the data axis stays sharded ``P(DATA_AXIS)``; the
    caller's top-k then runs on the gathered global batch."""
    if mesh is None:
        def objective(pulses, target, errors):
            return local_fn(pulses, target, errors)
        return objective

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS, MC_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    def objective(pulses, target, errors):
        f_local = local_fn(pulses, target, errors)
        return jax.lax.pmean(f_local, MC_AXIS)

    return objective


class SU2System:
    """Single-qubit system: ORE+PLE disorder, quaternion targets ``(B, 4)``.

    ``backend``: "xla" (scan) or "pallas" (fused Mosaic kernel).
    """

    def __init__(self, backend: str = "xla") -> None:
        self.backend = backend

    def sample_errors(self, key, shape, delta_std, epsilon_std):
        return sample_ore_ple(key, shape, delta_std, epsilon_std)

    def local_mean_fidelity(self, pulses, q_target, errors):
        delta, eps = errors
        return mean_fidelity_local(pulses, q_target, delta, eps, self.backend)


class SU4System:
    """Two-qubit system: independent per-qubit ORE + shared PLE, targets as
    (re, im) 4×4 pairs stacked into ``(B, 2, 4, 4)``.

    ``backend``: "xla" differentiates the SoA scan (autodiff); "pallas" uses
    the fused forward objective + fused reverse-sweep VJP kernels
    (``ops/propagate_su4_pallas{,_bwd}.py`` — O(1) residuals)."""

    def __init__(self, xtalk: float = 0.1, coupling: float = 0.5,
                 backend: str = "xla", drive2: bool = False) -> None:
        self.system = su4_mod.TwoQubitSystem(xtalk=xtalk, coupling=coupling,
                                             drive2=drive2)
        self.backend = backend

    @staticmethod
    def pack_target(U) -> jax.Array:
        """Complex ``(B, 4, 4)`` targets → real ``(B, 2, 4, 4)``.

        The split runs on HOST numpy: eager complex ops on remote-device
        backends are fragile (and pointless for a one-time featurization).
        """
        import numpy as np

        U = np.asarray(U)
        return jnp.asarray(np.stack([U.real, U.imag], axis=1)
                           .astype(np.float32))

    def sample_errors(self, key, shape, delta_std, epsilon_std):
        k1, k2, k3 = jax.random.split(key, 3)
        delta1 = jax.random.normal(k1, shape) * delta_std
        delta2 = jax.random.normal(k2, shape) * delta_std
        eps = jax.random.normal(k3, shape) * epsilon_std
        return delta1, delta2, eps

    def local_mean_fidelity(self, pulses, target, errors):
        delta1, delta2, eps = errors
        if self.backend == "pallas":
            if self.system.expm_order != 8:
                raise NotImplementedError(
                    f"the fused SU(4) Pallas kernels hard-code the order-8 "
                    f"Paterson–Stockmeyer expm; system.expm_order="
                    f"{self.system.expm_order} would silently train against "
                    f"different math — use backend='xla' or expm_order=8")
            from ..ops.propagate_su4_pallas_bwd import (
                mean_fidelity_su4_trainable,
            )
            return mean_fidelity_su4_trainable(
                pulses, target[:, 0], target[:, 1], delta1, delta2, eps,
                self.system.xtalk, self.system.coupling,
                self.system.expm_scaling, self.system.drive2)
        Ur, Ui = su4_mod.propagate_su4_mc(pulses, delta1, delta2, eps,
                                          self.system)
        F = su4_mod.fidelity_su4_ri(
            Ur, Ui, target[:, None, 0], target[:, None, 1])
        return jnp.mean(F, axis=1)
