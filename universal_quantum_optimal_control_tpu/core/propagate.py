r"""Batched composite-pulse propagators (XLA paths).

Replaces the reference's ``batched_unitary_generator``
(train/unitary_single_qubit_gate/universal_single_qubit_SCORE.py:77-145 — tree
product — and train/GRAPE/grape_train.py:78-138 — sequential loop) with
quaternion scans.  Three equivalent reductions are provided; all return the
composed propagator ``U_L ⋯ U_2 U_1`` as a quaternion:

* :func:`propagate_scan` — ``lax.scan`` over the segment axis (default; the
  body is all-elementwise so XLA fuses it into one loop over registers).
* :func:`propagate_assoc` — ``lax.associative_scan`` (log-depth, the TPU
  analog of the reference's pairwise product tree).
* :func:`propagate_unrolled` — static Python unroll (useful for short L and
  inside Pallas).

The Monte-Carlo–fused API :func:`propagate_mc` broadcasts one pulse table
across M disorder samples *without materializing the repeat* — the TPU-first
replacement for the reference's ``repeat_interleave`` fusion
(model/universal_model_trainer.py:80-84).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .su2 import (quat_multiply, quat_to_su2, segment_quat,
                  segment_quat_amp, segment_quat_det)

__all__ = [
    "propagate_scan",
    "propagate_assoc",
    "propagate_scan_remat",
    "propagate_unrolled",
    "propagate_mc",
    "unitary_generator",
]


def _segment_quats(pulses: jax.Array, delta: jax.Array, epsilon: jax.Array) -> jax.Array:
    """Per-segment quaternions ``(..., L, 4)`` from pulses.

    Pulse-space dispatch on the trailing parameter count:
      P = 2 → ``(φ, τ)`` fixed-amplitude drive (reference contract);
      P = 3 → ``(φ, Ω, τ)`` amplitude-modulated drive;
      P = 4 → ``(φ, Ω, Δ, τ)`` detuned drive — the reference's full
              declared space (test.py:16-18), XLA path.
    """
    P = pulses.shape[-1]
    if P == 2:
        return segment_quat(pulses[..., 0], pulses[..., 1],
                            delta[..., None], epsilon[..., None])
    if P == 3:
        return segment_quat_amp(pulses[..., 0], pulses[..., 1],
                                pulses[..., 2],
                                delta[..., None], epsilon[..., None])
    if P == 4:
        return segment_quat_det(pulses[..., 0], pulses[..., 1],
                                pulses[..., 2], pulses[..., 3],
                                delta[..., None], epsilon[..., None])
    raise ValueError(
        f"unsupported pulse parameter count: {P} (want 2, 3 or 4)")


def propagate_scan(pulses: jax.Array, delta: jax.Array, epsilon: jax.Array,
                   unroll: int = 4) -> jax.Array:
    """Compose ``U_L ⋯ U_1`` via ``lax.scan`` over the segment axis.

    Args:
      pulses: ``(..., L, 2)`` — last axis ``(φ, τ)``.
      delta / epsilon: ``(...,)`` static disorder per batch element.
    Returns:
      ``(..., 4)`` quaternion of the composed unitary.
    """
    segs = _segment_quats(pulses, delta, epsilon)  # (..., L, 4)
    segs = jnp.moveaxis(segs, -2, 0)  # (L, ..., 4)

    def body(carry, q):
        return quat_multiply(q, carry), None

    # derive the identity carry from the data so it inherits device-varying
    # type under shard_map (a plain quat_identity would be "unvarying")
    init = jnp.zeros_like(segs[0]).at[..., 0].set(1.0)
    out, _ = lax.scan(body, init, segs, unroll=unroll)
    return out


def propagate_assoc(pulses: jax.Array, delta: jax.Array, epsilon: jax.Array) -> jax.Array:
    """Compose via ``lax.associative_scan`` (log-depth product tree).

    TPU analog of the reference's pairwise tree (SCORE.py:130-142).
    """
    segs = _segment_quats(pulses, delta, epsilon)  # (..., L, 4)
    segs = jnp.moveaxis(segs, -2, 0)  # (L, ..., 4)
    # running products R_k = U_k ⋯ U_1: combine(a, b) = b ∘ a in unitary order
    prods = lax.associative_scan(lambda a, b: quat_multiply(b, a), segs, axis=0)
    return prods[-1]


def propagate_scan_remat(pulses: jax.Array, delta: jax.Array,
                         epsilon: jax.Array, chunk: int = 0) -> jax.Array:
    """Memory-light propagation: √L gradient checkpointing.

    A plain scan's VJP stores all L carries — ~1.3 GB at the reference's
    top scale (L=400, B·M=2e5).  Here the segment axis is split into
    ``chunk``-sized blocks scanned by an outer scan whose body is
    ``jax.checkpoint``ed: only L/chunk outer carries are saved and inner
    segments recompute in the backward pass — O(√L) memory at ~1 extra
    forward's FLOPs (which are free next to the transformer).
    """
    segs = _segment_quats(pulses, delta, epsilon)  # (..., L, 4)
    L = segs.shape[-2]
    if chunk <= 0:
        chunk = max(int(L ** 0.5), 1)
    pad = (-L) % chunk
    if pad:
        ident = jnp.zeros_like(segs[..., :pad, :]).at[..., 0].set(1.0)
        segs = jnp.concatenate([segs, ident], axis=-2)
    n_chunks = segs.shape[-2] // chunk
    segs = jnp.moveaxis(segs, -2, 0)  # (L', ..., 4)
    segs = segs.reshape((n_chunks, chunk) + segs.shape[1:])

    @jax.checkpoint
    def chunk_body(carry, block):
        def body(c, q):
            return quat_multiply(q, c), None
        out, _ = lax.scan(body, carry, block)
        return out, None

    init = jnp.zeros_like(segs[0, 0]).at[..., 0].set(1.0)
    out, _ = lax.scan(chunk_body, init, segs)
    return out


def propagate_unrolled(pulses: jax.Array, delta: jax.Array, epsilon: jax.Array) -> jax.Array:
    """Compose with a static Python loop (L must be a static shape)."""
    segs = _segment_quats(pulses, delta, epsilon)
    L = segs.shape[-2]
    out = segs[..., 0, :]
    for k in range(1, L):
        out = quat_multiply(segs[..., k, :], out)
    return out


def propagate_mc(pulses: jax.Array, delta: jax.Array, epsilon: jax.Array,
                 method: str = "scan") -> jax.Array:
    """Monte-Carlo–fused propagation: one pulse table per target, M samples.

    Args:
      pulses: ``(B, L, 2)``.
      delta / epsilon: ``(B, M)`` disorder draws.
    Returns:
      ``(B, M, 4)`` quaternions.

    The pulse table broadcasts across the M axis inside the computation —
    no ``repeat_interleave`` materialization (reference trainer.py:80-84).
    """
    fn = {"scan": propagate_scan, "assoc": propagate_assoc,
          "scan_remat": propagate_scan_remat,
          "unrolled": propagate_unrolled}[method]
    return fn(pulses[:, None, :, :], delta, epsilon)


def unitary_generator(pulses: jax.Array, error: jax.Array,
                      method: str = "scan") -> jax.Array:
    """Drop-in analog of the reference ``batched_unitary_generator`` contract.

    Args:
      pulses: ``(B, L, 2)``.
      error: ``(2, B)`` — row 0 = δ (off-resonant), row 1 = ε (pulse-length).
    Returns:
      ``(B, 2, 2)`` complex64 unitaries (reference SCORE.py:77-145).
    """
    fn = {"scan": propagate_scan, "assoc": propagate_assoc,
          "scan_remat": propagate_scan_remat,
          "unrolled": propagate_unrolled}[method]
    q = fn(pulses, error[0], error[1])
    return quat_to_su2(q)
