r"""Fidelities and training losses.

Reproduces all THREE fidelity normalizations that coexist in the reference
(they are distinct and all used somewhere — see SURVEY.md §2.8/§2.9/§2.16):

* :func:`entanglement_fidelity` — ``(|Tr(U†V)|² + d) / (d(d+1))``
  (trainer path, SCORE.py:168-183).
* :func:`trace_fidelity` — ``|Tr(U†V)|² / d²``
  (model staticmethod, model/universal_model.py:310-321; test.py:166-168).
* :func:`dcrab_fidelity` — ``(|Tr(U†V)| + d) / (d(d+1))`` with the trace
  magnitude NOT squared (dCRAB quirk, train/dCRAB/dCRAB.py:58).

Losses (SCORE.py:185-198): negative-log, infidelity, and the log-barrier
"sharp" loss ``log(1 + exp(−k(F − τ_bar)))·(1 − F)`` with τ_bar=0.99, k=100.

Quaternion fast paths avoid complex arithmetic entirely via
``Tr(U(q)†U(p)) = 2⟨q, p⟩``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .su2 import quat_trace_inner

__all__ = [
    "entanglement_fidelity",
    "trace_fidelity",
    "dcrab_fidelity",
    "entanglement_fidelity_q",
    "trace_fidelity_q",
    "negative_log_loss",
    "infidelity_loss",
    "sharp_loss",
    "log_barrier",
]


def _trace_abs(U_out: jax.Array, U_target: jax.Array) -> jax.Array:
    """|Tr(U_out† U_target)| for batched complex matrices ``(..., d, d)``."""
    tr = jnp.einsum("...ji,...ji->...", jnp.conj(U_out), U_target)
    return jnp.abs(tr)


def entanglement_fidelity(U_out: jax.Array, U_target: jax.Array) -> jax.Array:
    """``F = (|Tr(U†V)|² + d) / (d(d+1))`` — reference SCORE.py:168-183."""
    d = U_out.shape[-1]
    t = _trace_abs(U_out, U_target)
    return (t * t + d) / (d * (d + 1))


def trace_fidelity(U_out: jax.Array, U_target: jax.Array) -> jax.Array:
    """``F = |Tr(U†V)|² / d²`` — reference universal_model.py:310-321."""
    d = U_out.shape[-1]
    t = _trace_abs(U_out, U_target)
    return (t * t) / (d * d)


def dcrab_fidelity(U_out: jax.Array, U_target: jax.Array) -> jax.Array:
    """``F = (|Tr(U†V)| + d) / (d(d+1))`` — unsquared trace (dCRAB.py:58).

    Reference quirk preserved deliberately: because the trace magnitude is
    NOT squared, the maximum value is ``2d/(d(d+1))`` (= 2/3 for d=2), not 1.
    """
    d = U_out.shape[-1]
    return (_trace_abs(U_out, U_target) + d) / (d * (d + 1))


# --------------------------------------------------------------------------
# Quaternion fast paths (SU(2) only, d = 2)
# --------------------------------------------------------------------------

def entanglement_fidelity_q(q_out: jax.Array, q_target: jax.Array) -> jax.Array:
    """Quaternion form of :func:`entanglement_fidelity`: ``(4⟨q,p⟩² + 2)/6``."""
    t = quat_trace_inner(q_out, q_target)
    return (t * t + 2.0) / 6.0


def trace_fidelity_q(q_out: jax.Array, q_target: jax.Array) -> jax.Array:
    """Quaternion form of :func:`trace_fidelity`: ``⟨q,p⟩²``."""
    t = quat_trace_inner(q_out, q_target)
    return 0.25 * t * t


# --------------------------------------------------------------------------
# Losses over the Monte-Carlo expectation  E[F]
# --------------------------------------------------------------------------

def negative_log_loss(mean_fidelity: jax.Array) -> jax.Array:
    """``−log E[F]`` (reference SCORE.py:185-186)."""
    return -jnp.log(mean_fidelity)


def infidelity_loss(mean_fidelity: jax.Array) -> jax.Array:
    """``1 − E[F]`` (reference SCORE.py:189-190)."""
    return 1.0 - mean_fidelity


def log_barrier(x: jax.Array, tau_bar: float = 0.99, k: float = 100.0) -> jax.Array:
    """``log(1 + exp(−k(x − τ)))·(1 − x)`` — reference ``custom_loss``
    (SCORE.py:197-198), computed with a stable softplus."""
    return jax.nn.softplus(-k * (x - tau_bar)) * (1.0 - x)


def sharp_loss(mean_fidelity: jax.Array, tau_bar: float = 0.99, k: float = 100.0) -> jax.Array:
    """Log-barrier loss on E[F] (reference ``sharp_loss``, SCORE.py:193-195)."""
    return log_barrier(mean_fidelity, tau_bar, k)
