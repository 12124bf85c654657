r"""Inference pipeline — cached, jitted wrapper over a trained pulse model.

Replaces the reference ``Pipeline`` (model/universal_model.py:350-387) with a
functional wrapper that jits ``model.apply`` once and reuses it (the reference
demo re-instantiates the model and re-loads weights on every web request —
demo_universal/app.py:65-69).  Also fixes the reference bug where
``forward_with_unitary`` calls a nonexistent method (universal_model.py:387).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..core.su2 import su2_to_quat

__all__ = ["Pipeline", "rotation_vector_from_unitary"]


def rotation_vector_from_unitary(U: jax.Array) -> jax.Array:
    """``(B, 2, 2)`` SU(2) matrices → ``(B, 4)`` rotation vectors.

    Robust extraction via the quaternion: θ = 2·atan2(‖v‖, w), n = v/‖v‖
    (axis defaults to +x as ‖v‖→0).  Replaces the reference's matrix-element
    peeking (universal_model.py:381-386), which assumed a specific form.
    """
    q = su2_to_quat(U)
    w, v = q[..., 0], q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(vnorm, w)
    safe = jnp.maximum(vnorm, 1e-12)[..., None]
    n = jnp.where(vnorm[..., None] > 1e-9, v / safe,
                  jnp.asarray([1.0, 0.0, 0.0]))
    return jnp.concatenate([n, theta[..., None]], axis=-1)


class Pipeline:
    """Eval-mode inference wrapper.

    Args:
      model: a linen module with ``__call__(rotation_vector, ...)``.
      params: trained parameter pytree (e.g. from a checkpoint).
      base_pulse: optional finetune base pulse passed through to the model.
    """

    def __init__(self, model: Any, params: Any,
                 base_pulse: Optional[jax.Array] = None) -> None:
        self.model = model
        self.params = params
        self.base_pulse = base_pulse

        import inspect

        has_det = "deterministic" in inspect.signature(
            type(model).__call__).parameters

        def _forward(p, rotation_vector):
            kwargs = {"deterministic": True} if has_det else {}
            if getattr(model, "finetune", False):
                kwargs["base_pulse"] = base_pulse
            return model.apply(p, rotation_vector, **kwargs)

        self._forward = jax.jit(_forward)

    def __call__(self, rotation_vector: jax.Array) -> jax.Array:
        return self._forward(self.params, jnp.asarray(rotation_vector))

    def forward_with_unitary(self, unitary: jax.Array) -> jax.Array:
        """``(B, 2, 2)`` target unitaries → pulses, via rotation-vector
        extraction (reference universal_model.py:374-387, fixed)."""
        return self(rotation_vector_from_unitary(jnp.asarray(unitary)))
