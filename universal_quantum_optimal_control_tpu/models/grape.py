r"""GRAPE pulse model — per-target gradient-ascent pulse table.

The reference GRAPE (model/GRAPE_model.py:25-91) reparameterizes the pulse
table through a tiny bias-free MLP ``4 → 3L → 3L`` with ReLU, then maps the
three output channels ``(u_x, u_y, u_τ)`` to physical ``(φ, τ)`` via
``φ = atan2(σ(u_y), σ(u_x))`` and a range map.  That exact reparameterization
is kept (including its quirk: since both sigmoids are positive, the atan2
lands in (0, π/2) *before* the affine range map — documented reference
behavior, GRAPE_model.py:80-89), because the smooth surjection is what GRAPE
optimizes through.

A second, simpler mode (``direct=True``) optimizes the raw ``(B, L, 3)``
logits as a parameter table with no MLP — the classic GRAPE formulation.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from flax import linen as nn

from .universal_transformer import PulseSpace, normalize_pulse_space

__all__ = ["GRAPE"]


class GRAPE(nn.Module):
    """GRAPE pulse generator (reference GRAPE_model.py:25-91)."""

    pulse_space: PulseSpace = (("phi", (-3.15, 3.15)), ("tau", (0.035, 0.07)))
    num_pulses: int = 400
    num_qubits: int = 1
    direct: bool = False

    @nn.compact
    def __call__(self, rotation_vector: jax.Array) -> jax.Array:
        """``(B, 4)`` rotation vectors → ``(B, L, 2)`` pulses ``(φ, τ)``."""
        B = rotation_vector.shape[0]
        L = self.num_pulses

        P = len(self.pulse_space)
        n_logits = P + 1  # (u_x, u_y) -> phi, plus one channel per extra param

        if self.direct:
            logits = self.param(
                "pulse_logits",
                nn.initializers.normal(0.1),
                (B, L, n_logits),
            )
        else:
            if P != 2:
                raise ValueError(
                    "the reference MLP reparameterization is defined for the "
                    "2-parameter (phi, tau) space; use direct=True for "
                    "general pulse spaces")
            h = nn.Dense(3 * L, use_bias=False, name="fc1")(rotation_vector)
            h = nn.relu(h)
            h = nn.Dense(3 * L, use_bias=False, name="fc2")(h)
            logits = h.reshape(B, L, 3)

        u = jax.nn.sigmoid(logits)
        phi_unit = jnp.arctan2(u[..., 1], u[..., 0])
        units = jnp.concatenate([phi_unit[..., None], u[..., 2:]], axis=-1)

        low = jnp.asarray([lo for _, (lo, _) in self.pulse_space], jnp.float32)
        high = jnp.asarray([hi for _, (_, hi) in self.pulse_space], jnp.float32)
        pulses = low + (high - low) * units
        pulses = pulses.at[..., -1].set(nn.relu(pulses[..., -1]))
        return pulses
