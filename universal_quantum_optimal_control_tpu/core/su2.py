r"""SU(2) algebra on real quaternions — the TPU-native foundation.

Every SU(2) unitary is represented by a real unit quaternion ``q = (w, x, y, z)``
under the isomorphism

    U(q) = w·I − i·(x·σx + y·σy + z·σz),

so that ``exp(−i·(θ/2)·n̂·σ) ↔ (cos θ/2, sin θ/2 · n̂)``.  This removes the
complex dtype (slow on TPU) and the general matrix exponential from the hot
path: a control segment's propagator is a closed-form quaternion (~20 real
FLOPs) and composition is the Hamilton product (16 mults).  The reference
framework instead calls ``torch.linalg.matrix_exp`` on batched complex 2×2
Hamiltonians and reduces with batched complex matmuls
(reference: train/unitary_single_qubit_gate/universal_single_qubit_SCORE.py:117-142).

Key identities used throughout (all unit-tested against complex-matrix math):

* homomorphism:  U(q1) @ U(q2) = U(q1 ⊗ q2)   (Hamilton product, same order)
* trace inner product:  Tr(U(q)† U(p)) = 2·⟨q, p⟩   (real dot product)
* entanglement fidelity (d=2): F = (4⟨q, p⟩² + 2) / 6

All functions are pure, jittable, and broadcast over arbitrary leading axes
with the quaternion components in the trailing axis of size 4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "quat_identity",
    "quat_multiply",
    "quat_conj",
    "quat_normalize",
    "axis_angle_to_quat",
    "rotation_vector_to_quat",
    "segment_quat",
    "segment_quat_amp",
    "quat_to_su2",
    "su2_to_quat",
    "quat_trace_inner",
    "quat_fidelity",
]


def quat_identity(shape=(), dtype=jnp.float32) -> jax.Array:
    """Identity quaternion (1, 0, 0, 0) broadcast to ``shape + (4,)``."""
    q = jnp.zeros(tuple(shape) + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product ``q1 ⊗ q2`` — maps to ``U(q1) @ U(q2)``.

    Broadcasts over leading axes; trailing axis is (w, x, y, z).
    """
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    """Quaternion conjugate — maps to ``U(q)†`` for unit quaternions."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    n = jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), eps))
    return q / n


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """``exp(−i·(angle/2)·n̂·σ)`` as a quaternion.  ``axis`` need not be unit.

    Broadcasts: ``axis (..., 3)``, ``angle (...,)`` → ``(..., 4)``.
    Safe at angle→0 and ‖axis‖→0 (returns identity; gradients stay finite via
    a sinc-style formulation).
    """
    norm2 = jnp.sum(axis * axis, axis=-1)
    norm = jnp.sqrt(jnp.maximum(norm2, 1e-24))
    half = 0.5 * angle
    w = jnp.cos(half)
    # sin(half)/norm * axis, with axis pre-normalized: sin(half) * axis/norm
    s = jnp.sin(half) / norm
    v = axis * s[..., None]
    return jnp.concatenate([w[..., None], v], axis=-1)


def rotation_vector_to_quat(rotation_vector: jax.Array) -> jax.Array:
    """Reference rotation-vector convention ``(n_x, n_y, n_z, θ)`` → quaternion.

    The axis is normalized (fixing the reference's GRAPE dataset quirk where
    normalization is skipped — grape_train.py:230 vs SCORE.py:237).
    """
    n = rotation_vector[..., :3]
    theta = rotation_vector[..., 3]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return axis_angle_to_quat(n, theta)


def segment_quat(
    phi: jax.Array,
    tau: jax.Array,
    delta: jax.Array,
    epsilon: jax.Array,
) -> jax.Array:
    r"""Closed-form propagator quaternion for one phase-control segment.

    Physics contract (reference SCORE.py:117-127):

        H = ½·(1 + ε)·(cos φ·σx + sin φ·σy + δ·σz)
        U = exp(−i·H·τ)

    i.e. an axis-angle rotation about ``a = (cos φ, sin φ, δ)`` (norm
    ``√(1+δ²)``) by angle ``τ·(1+ε)·√(1+δ²)``.  All inputs broadcast
    elementwise; output has trailing axis 4.
    """
    anorm = jnp.sqrt(1.0 + delta * delta)
    half = 0.5 * tau * (1.0 + epsilon) * anorm
    w = jnp.cos(half)
    s = jnp.sin(half) / anorm  # sin(half) * (unit-axis scale)
    comps = jnp.broadcast_arrays(
        w, s * jnp.cos(phi), s * jnp.sin(phi), s * delta)
    return jnp.stack(comps, axis=-1)


def segment_quat_amp(
    phi: jax.Array,
    omega: jax.Array,
    tau: jax.Array,
    delta: jax.Array,
    epsilon: jax.Array,
) -> jax.Array:
    r"""Amplitude-modulated segment propagator quaternion.

    Generalizes :func:`segment_quat` to a 3-parameter pulse space (φ, Ω, τ):

        H = ½·(1 + ε)·(Ω·cos φ·σx + Ω·sin φ·σy + δ·σz),   U = exp(−i·H·τ)

    i.e. a controllable Rabi amplitude Ω (the reference declares the general
    P-parameter ``pulse_space`` interface — universal_model.py:31, test.py's
    (Δ, Ω, φ, t) space — but its generator asserts P = 2; here Ω is a
    first-class control, enabling e.g. free evolution segments (Ω→0) that
    the fixed-amplitude drive cannot express).  Ω ≤ 0 is clamped to 0.
    """
    omega = jnp.maximum(omega, 0.0)
    anorm = jnp.sqrt(omega * omega + delta * delta)
    half = 0.5 * tau * (1.0 + epsilon) * anorm
    w = jnp.cos(half)
    s = jnp.sin(half) / jnp.maximum(anorm, 1e-12)
    comps = jnp.broadcast_arrays(
        w, s * omega * jnp.cos(phi), s * omega * jnp.sin(phi), s * delta)
    return jnp.stack(comps, axis=-1)


def segment_quat_det(
    phi: jax.Array,
    omega: jax.Array,
    det: jax.Array,
    tau: jax.Array,
    delta: jax.Array,
    epsilon: jax.Array,
) -> jax.Array:
    r"""Detuned amplitude-modulated segment propagator quaternion.

    Completes the reference's declared 4-parameter single-qubit pulse space
    ``(Δ, Ω, φ, t)`` (test.py:16-18; interface universal_model.py:31,
    47-51 — the reference's generator asserts P = 2 and never implements
    it).  A controllable detuning Δ adds to the off-resonance disorder δ
    on the σz axis:

        H = ½·(1 + ε)·(Ω·cos φ·σx + Ω·sin φ·σy + (Δ + δ)·σz)
        U = exp(−i·H·τ)

    Parameter order here is ``(φ, Ω, Δ, τ)`` — φ first and τ last so the
    model head's φ-offset/wrap (channel 0) and relu(τ) (channel −1)
    conventions hold unchanged across P ∈ {2, 3, 4}.  Ω ≤ 0 clamps to 0.
    """
    omega = jnp.maximum(omega, 0.0)
    z = det + delta
    anorm = jnp.sqrt(omega * omega + z * z)
    half = 0.5 * tau * (1.0 + epsilon) * anorm
    w = jnp.cos(half)
    s = jnp.sin(half) / jnp.maximum(anorm, 1e-12)
    comps = jnp.broadcast_arrays(
        w, s * omega * jnp.cos(phi), s * omega * jnp.sin(phi), s * z)
    return jnp.stack(comps, axis=-1)


def quat_to_su2(q: jax.Array) -> jax.Array:
    """Quaternion → complex 2×2 SU(2) matrix ``(..., 2, 2)`` (complex64)."""
    w, x, y, z = (q[..., i] for i in range(4))
    m00 = w - 1j * z
    m01 = -1j * x - y
    m10 = -1j * x + y
    m11 = w + 1j * z
    row0 = jnp.stack([m00, m01], axis=-1)
    row1 = jnp.stack([m10, m11], axis=-1)
    return jnp.stack([row0, row1], axis=-2).astype(jnp.complex64)


def su2_to_quat(U: jax.Array) -> jax.Array:
    """Complex 2×2 SU(2) matrix → real quaternion ``(..., 4)``.

    Inverts :func:`quat_to_su2`:  w = Re(U00+U11)/2, z = −Im(U00−U11)/2,
    x = −Im(U01+U10)/2, y = Re(U10−U01)/2.  For exact SU(2) inputs this is
    lossless; for inputs with a stray global phase the result is the closest
    projective representative (renormalized).
    """
    w = 0.5 * jnp.real(U[..., 0, 0] + U[..., 1, 1])
    z = -0.5 * jnp.imag(U[..., 0, 0] - U[..., 1, 1])
    x = -0.5 * jnp.imag(U[..., 0, 1] + U[..., 1, 0])
    y = 0.5 * jnp.real(U[..., 1, 0] - U[..., 0, 1])
    return quat_normalize(jnp.stack([w, x, y, z], axis=-1))


def quat_trace_inner(q_out: jax.Array, q_target: jax.Array) -> jax.Array:
    """``Tr(U(q_out)† U(q_target)) = 2·⟨q_out, q_target⟩`` (real)."""
    return 2.0 * jnp.sum(q_out * q_target, axis=-1)


def quat_fidelity(q_out: jax.Array, q_target: jax.Array) -> jax.Array:
    """Entanglement fidelity for d=2: ``(|Tr|² + d)/(d(d+1)) = (4⟨q,p⟩² + 2)/6``.

    Matches reference ``fidelity`` (SCORE.py:168-183) for SU(2) arguments.
    """
    t = quat_trace_inner(q_out, q_target)
    return (t * t + 2.0) / 6.0
