r"""GRAPE pulse model — per-target gradient-ascent pulse table.

The reference GRAPE (model/GRAPE_model.py:25-91) reparameterizes the pulse
table through a tiny bias-free MLP ``4 → 3L → 3L`` with ReLU, then maps the
three output channels ``(u_x, u_y, u_τ)`` to physical ``(φ, τ)`` via
``φ = atan2(σ(u_y), σ(u_x))`` and a range map.  That exact reparameterization
is kept (including its quirk: since both sigmoids are positive, the atan2
lands in (0, π/2) *before* the affine range map — documented reference
behavior, GRAPE_model.py:80-89), because the smooth surjection is what GRAPE
optimizes through.

A second, simpler mode (``direct=True``) optimizes a raw
``(num_targets, L, n)`` logit table with no MLP — the classic GRAPE
formulation.  The table is batch-independent: with the default
``num_targets=1`` it broadcasts over the input batch (classic per-target
GRAPE conditions on ONE target; disorder robustness comes from the MC axis),
so the parameter shape never depends on the batch the model was initialized
with.
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
    num_targets: int = 1  # direct mode: rows in the pulse table (static —
                          # NOT tied to the batch the model was init'd with)

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
                (self.num_targets, L, n_logits),
            )
            if self.num_targets == 1:
                logits = jnp.broadcast_to(logits, (B, L, n_logits))
            elif self.num_targets != B:
                raise ValueError(
                    f"direct GRAPE with num_targets={self.num_targets} "
                    f"requires the full target batch (B={B}) each call; "
                    "train full-batch or use num_targets=1")
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
