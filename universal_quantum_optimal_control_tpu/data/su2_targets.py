r"""SU(2) target datasets — grid and random rotation-vector builders.

Reference ``build_SU2_dataset`` (train/unitary_single_qubit_gate/
universal_single_qubit_SCORE.py:215-251): grid mode meshes polar angle θ ×
rotation angle α with random azimuth; random mode draws all three uniformly.
Targets are returned both as rotation vectors ``(B, 4) = (n̂, α)`` and as
quaternions (the matrix form is one ``quat_to_su2`` away).

Differences from the reference (deliberate):
* explicit PRNG key (torch global RNG in the reference),
* axis normalization always applied (the reference's GRAPE copy forgets it —
  grape_train.py:230),
* an additional ``haar=True`` mode draws axes uniformly on the sphere
  (``cos θ ~ U(−1,1)``) — the reference's ``θ ~ U(0, π)`` polar draw
  oversamples the poles; both are available.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.su2 import axis_angle_to_quat, quat_to_su2

__all__ = ["build_su2_dataset", "named_gate_rotation_vectors"]


def build_su2_dataset(
    key: jax.Array,
    batch_size: int = 10000,
    random: bool = False,
    haar: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Build ``(rotation_vectors (B, 4), target_quaternions (B, 4))``.

    Grid mode (``random=False``): ``B' = ⌊√batch_size⌋`` linspace over polar
    θ ∈ [0, π] × rotation angle α ∈ [0, 2π], random azimuth — actual size is
    ``B'²`` (reference SCORE.py:218-226).  Random mode: uniform draws.
    """
    if not random:
        Bs = int(math.isqrt(batch_size))
        theta_lin = jnp.linspace(0.0, jnp.pi, Bs)
        alpha_lin = jnp.linspace(0.0, 2.0 * jnp.pi, Bs)
        theta, alpha = jnp.meshgrid(theta_lin, alpha_lin, indexing="ij")
        theta, alpha = theta.reshape(-1), alpha.reshape(-1)
        phi = jax.random.uniform(key, (Bs * Bs,)) * 2.0 * jnp.pi
    else:
        k1, k2, k3 = jax.random.split(key, 3)
        if haar:
            cos_theta = jax.random.uniform(k1, (batch_size,), minval=-1.0, maxval=1.0)
            theta = jnp.arccos(cos_theta)
        else:
            theta = jax.random.uniform(k1, (batch_size,)) * jnp.pi
        alpha = jax.random.uniform(k2, (batch_size,)) * 2.0 * jnp.pi
        phi = jax.random.uniform(k3, (batch_size,)) * 2.0 * jnp.pi

    n = jnp.stack(
        [jnp.sin(theta) * jnp.cos(phi),
         jnp.sin(theta) * jnp.sin(phi),
         jnp.cos(theta)],
        axis=1,
    )
    n = n / jnp.linalg.norm(n, axis=1, keepdims=True)
    rotation_vector = jnp.concatenate([n, alpha[:, None]], axis=1)
    q_target = axis_angle_to_quat(n, alpha)
    return rotation_vector, q_target


# Named gates used across the reference's analysis/demo layer
# (visualize/visualize_universal_with_pipeline.py:77-85).
_SQRT2 = 1.0 / math.sqrt(2.0)
_NAMED = {
    "X": (1.0, 0.0, 0.0, math.pi),
    "X(pi/2)": (1.0, 0.0, 0.0, math.pi / 2),
    "Y": (0.0, 1.0, 0.0, math.pi),
    "Z(pi/4)": (0.0, 0.0, 1.0, math.pi / 4),
    "H": (_SQRT2, 0.0, _SQRT2, math.pi),
}


def named_gate_rotation_vectors() -> dict:
    """Standard single-qubit benchmark gates as rotation vectors."""
    return {k: jnp.asarray(v, jnp.float32) for k, v in _NAMED.items()}
