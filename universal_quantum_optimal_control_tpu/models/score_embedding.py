r"""SCORE composite-pulse embedding — functional, jit-safe, quaternion-based.

Pipeline (reference model/universal_model.py:83-347, re-derived for JAX):

1. rescale the target rotation vector into the xz-plane (the φ-offset
   equivariance trick: the in-plane azimuth is re-added to the output pulses),
2. YXY Euler decomposition  exp(−iθ/2 n·σ) = R_y(α) R_x(β) R_γ(γ) with
   branchless gimbal-lock handling (``jnp.where`` chains instead of the
   reference's boolean-mask indexing at universal_model.py:174-193),
3. each Euler angle expands into a 3-pulse SCORE composite → 9 unitaries,
4. flattened into real vectors (interleaved re/im — universal_model.py:299-308)
   ready for linear projection + sinusoidal positional encoding.

All rotations are computed as quaternions and converted to matrices only at
the flattening step.

Note on the SCORE middle-pulse angle: the reference uses ``φ + 2θ'``
(universal_model.py:250) which does not reproduce the target rotation at zero
error; the physically correct composite uses ``angle + 2θ'``.  Both are
supported via ``middle_convention`` ("angle" default, "reference" for
bit-level parity with the reference featurization).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.su2 import axis_angle_to_quat, quat_to_su2  # quat_to_su2 kept for the complex-path oracle

__all__ = [
    "euler_yxy_from_rotation_vector",
    "score_triplet",
    "score_sequence_from_yxy",
    "score_features",
    "sinusoidal_positional_encoding",
]


def euler_yxy_from_rotation_vector(rotation_vector: jax.Array,
                                   eps: float = 1e-12) -> jax.Array:
    """Vectorized Y-X-Y Euler decomposition (branchless).

    Args:
      rotation_vector: ``(..., 4)`` as ``(n_x, n_y, n_z, θ)``.
    Returns:
      ``(..., 3)`` angles ``(α, β, γ)`` with
      ``exp(−iθ/2 n·σ) = R_y(α) R_x(β) R_y(γ)``.

    Same quaternion identities as reference universal_model.py:148-195, with
    the gimbal-lock branches (β≈0 → Y-only; β≈π → X/Z) expressed as
    ``jnp.where`` selections over NaN-safe inputs so gradients stay finite.
    """
    n = rotation_vector[..., :3]
    theta = rotation_vector[..., 3]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), eps)

    s, c = jnp.sin(theta / 2), jnp.cos(theta / 2)
    w = c
    x = n[..., 0] * s
    y = n[..., 1] * s
    z = n[..., 2] * s

    # r² = x² + z² = sin²(β/2);  w² + y² = cos²(β/2).  Branch masks are
    # computed from these exact quantities (the reference thresholds sin β —
    # universal_model.py:176-178 — which breaks once β is epsilon-clipped).
    r2 = x * x + z * z
    c2 = w * w + y * y
    # clip epsilon must be representable in f32 (1 − 1e-12 rounds back to 1.0,
    # which would put arccos' gradient at −inf); 1e-7 keeps the gradient
    # finite while perturbing β by ≤ ~6e-4 rad at the poles.
    clip_eps = 1e-7
    beta = jnp.arccos(jnp.clip(1.0 - 2.0 * r2, -1.0 + clip_eps, 1.0 - clip_eps))

    tol2 = 1e-9
    mask_beta0 = r2 < tol2    # β ≈ 0  → Y-only rotation
    mask_betapi = c2 < tol2   # β ≈ π  → X/Z rotation
    mask_reg = jnp.logical_and(~mask_beta0, ~mask_betapi)

    # atan2(0, 0) has NaN gradients; substitute safe arguments where the
    # branch is not selected (double-where trick).
    def safe_atan2(num, den, mask):
        num_s = jnp.where(mask, num, 1.0)
        den_s = jnp.where(mask, den, 1.0)
        return jnp.where(mask, jnp.arctan2(num_s, den_s), 0.0)

    alpha_reg = safe_atan2(x * y - z * w, y * z + w * x, mask_reg)
    gamma_reg = safe_atan2(x * y + z * w, w * x - y * z, mask_reg)
    alpha_b0 = 2.0 * safe_atan2(y, w, mask_beta0)
    # β ≈ π (θ = π, axis in the xz-plane): only γ − α is determined; pick the
    # split that is the θ → π⁻ limit of the regular branch (α* = atan2(−z, x),
    # γ* = atan2(z, x), since w → 0⁺ factors out of both atan2s).  A fixed
    # α = 0 split reconstructs the same unitary but yields SCORE tokens that
    # are discontinuous against the surrounding θ < π training distribution —
    # trained models scored F ≈ 0.40 on exact H/tilted-axis-π targets while
    # scoring 0.99 at θ = 0.98π (the reference's branch, universal_model.py:
    # 184-188, has the same defect; its demo gates are likewise θ = π).
    alpha_bpi = safe_atan2(-z, x, mask_betapi)
    gamma_bpi = safe_atan2(z, x, mask_betapi)

    alpha = alpha_reg + alpha_b0 + alpha_bpi  # disjoint branches; unselected 0
    gamma = gamma_reg + gamma_bpi
    return jnp.stack([alpha, beta, gamma], axis=-1)


def score_correction_angle(angle: jax.Array) -> jax.Array:
    """SCORE flanking-pulse angle ``θ' = π − angle − asin(½ sin(angle/2))``
    (reference universal_model.py:244)."""
    return jnp.pi - angle - jnp.arcsin(0.5 * jnp.sin(angle / 2))


def score_triplet(phi: jax.Array, angle: jax.Array,
                  middle_convention: str = "angle") -> jax.Array:
    """3-pulse SCORE composite for a rotation about in-plane axis φ by angle.

    Returns quaternions ``(..., 3, 4)``:
    ``[R(φ+π, θ'), R(φ, middle), R(φ+π, θ')]`` with θ' from
    :func:`score_correction_angle` and middle = ``angle + 2θ'`` (correct) or
    ``φ + 2θ'`` (reference parity — universal_model.py:250).
    """
    theta_p = score_correction_angle(angle)
    if middle_convention == "angle":
        middle = angle + 2.0 * theta_p
    elif middle_convention == "reference":
        middle = phi + 2.0 * theta_p
    else:
        raise ValueError(f"unknown middle_convention: {middle_convention}")

    def in_plane_axis(p):
        zeros = jnp.zeros_like(p)
        return jnp.stack([jnp.cos(p), jnp.sin(p), zeros], axis=-1)

    flank_axis = in_plane_axis(phi + jnp.pi)
    mid_axis = in_plane_axis(phi)
    q_flank = axis_angle_to_quat(flank_axis, theta_p)
    q_mid = axis_angle_to_quat(mid_axis, middle)
    return jnp.stack([q_flank, q_mid, q_flank], axis=-2)


def score_sequence_from_yxy(euler_angles: jax.Array,
                            middle_convention: str = "angle") -> jax.Array:
    """Y-X-Y Euler triple → 9 SCORE quaternions ``(..., 9, 4)``.

    Token order matches the reference (universal_model.py:265-293):
    ``SCORE(0, α) ‖ SCORE(π/2, β) ‖ SCORE(0, γ)``.
    """
    alpha = euler_angles[..., 0]
    beta = euler_angles[..., 1]
    gamma = euler_angles[..., 2]
    zero = jnp.zeros_like(alpha)
    half_pi = jnp.full_like(alpha, jnp.pi / 2)
    blocks = [
        score_triplet(zero, alpha, middle_convention),
        score_triplet(half_pi, beta, middle_convention),
        score_triplet(zero, gamma, middle_convention),
    ]
    return jnp.concatenate(blocks, axis=-2)


def to_real_vector(U: jax.Array) -> jax.Array:
    """Flatten complex ``(..., d, d)`` to interleaved re/im ``(..., 2d²)``
    (reference universal_model.py:299-308)."""
    flat_r = jnp.real(U).reshape(*U.shape[:-2], -1)
    flat_i = jnp.imag(U).reshape(*U.shape[:-2], -1)
    return jnp.stack([flat_r, flat_i], axis=-1).reshape(*U.shape[:-2], -1)


def quat_to_real_vector(q: jax.Array) -> jax.Array:
    """``to_real_vector(quat_to_su2(q))`` computed WITHOUT complex dtype.

    For U(q) = w·I − i(x·σx + y·σy + z·σz), the interleaved re/im flattening
    is the fixed linear map ``[w, −z, −y, −x, y, −x, w, z]`` of the
    quaternion components — keeps the embedding path complex-free on TPU
    (verified against the complex path in tests).
    """
    w, x, y, z = (q[..., i] for i in range(4))
    return jnp.stack([w, -z, -y, -x, y, -x, w, z], axis=-1)


def score_features(rotation_vector: jax.Array,
                    middle_convention: str = "angle") -> tuple[jax.Array, jax.Array]:
    """Full SCORE featurization of a batch of targets.

    Args:
      rotation_vector: ``(B, 4)`` as ``(n_x, n_y, n_z, θ)``.
    Returns:
      ``(tokens, phi_offset)`` where tokens is ``(B, 9, 8)`` real features
      (flattened 2×2 unitaries) and phi_offset is ``(B,)`` — the in-plane
      azimuth ``atan2(n_y, n_x)`` to re-add to output pulse phases
      (reference universal_model.py:94-102, 141).
    """
    phi_offset = jnp.arctan2(rotation_vector[..., 1], rotation_vector[..., 0])
    n_xy = jnp.sqrt(rotation_vector[..., 0] ** 2 + rotation_vector[..., 1] ** 2)
    rescaled = jnp.stack(
        [n_xy, jnp.zeros_like(n_xy), rotation_vector[..., 2],
         rotation_vector[..., 3]],
        axis=-1,
    )
    euler = euler_yxy_from_rotation_vector(rescaled)
    quats = score_sequence_from_yxy(euler, middle_convention)  # (B, 9, 4)
    tokens = quat_to_real_vector(quats)  # (B, 9, 8) — complex-free path
    return tokens, phi_offset


def sinusoidal_positional_encoding(length: int, d_model: int,
                                   dtype=jnp.float32) -> jax.Array:
    """Standard sin/cos positional encoding ``(length, d_model)``
    (reference universal_model.py:327-347)."""
    position = jnp.arange(length, dtype=dtype)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=dtype)
                       * (-math.log(10000.0) / d_model))
    ang = position * div_term[None, :]
    pe = jnp.zeros((length, d_model), dtype=dtype)
    pe = pe.at[:, 0::2].set(jnp.sin(ang))
    pe = pe.at[:, 1::2].set(jnp.cos(ang))
    return pe
