r"""Universal pulse-synthesis transformer (Flax linen).

Maps a target rotation vector ``(n_x, n_y, n_z, θ)`` to a composite pulse
sequence ``(B, max_pulses, P)`` through the SCORE embedding
(:mod:`.score_embedding`) and a post-LN transformer encoder — the TPU-native
redesign of the reference ``UniversalQOCTransformer``
(model/universal_model.py:21-145).

TPU-first choices:
* compute dtype is configurable (default bfloat16 → MXU-friendly matmuls,
  float32 params and physics outputs),
* the finetune base-pulse blend is an explicit ``base_pulse`` argument
  instead of a ``torch.load`` inside ``forward`` (universal_model.py:135-138),
* φ-offset equivariance and the (−π, π] wrap are applied functionally.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .score_embedding import score_features, sinusoidal_positional_encoding

__all__ = ["UniversalQOCTransformer", "normalize_pulse_space", "wrap_angle"]

PulseSpace = Tuple[Tuple[str, Tuple[float, float]], ...]


# physics channel order: φ first (gets the offset/wrap), τ last (relu'd).
# Recognized key names sort into this order regardless of declaration order,
# so the reference's literal `{"Delta", "Omega", "phi", "tau"}` declaration
# (test.py:16-18) maps onto the propagator's (φ, Ω, Δ, τ) convention.
_CANONICAL_KEY_ORDER = {"phi": 0, "phi1": 0, "phi2": 1,
                        "omega": 2, "Omega": 2, "delta": 3, "Delta": 3,
                        "tau": 4, "t": 4}


def normalize_pulse_space(pulse_space) -> PulseSpace:
    """Dict or tuple pulse space → canonical hashable tuple form.

    The reference declares ``pulse_space: Dict[str, (low, high)]``
    (universal_model.py:31, 47-51); Flax module fields must be hashable.
    When every key is a recognized control name, entries are reordered
    into the propagator's channel convention (φ…, Ω, Δ, τ); unknown keys
    keep their declaration order.
    """
    if isinstance(pulse_space, dict):
        items = [(k, (float(v[0]), float(v[1])))
                 for k, v in pulse_space.items()]
    else:
        items = [(k, (float(lo), float(hi))) for k, (lo, hi) in pulse_space]
    if all(k in _CANONICAL_KEY_ORDER for k, _ in items):
        items.sort(key=lambda kv: _CANONICAL_KEY_ORDER[kv[0]])
    return tuple(items)


def wrap_angle(x: jax.Array) -> jax.Array:
    """Wrap to (−π, π] (reference universal_model.py:143)."""
    return jnp.mod(x + jnp.pi, 2.0 * jnp.pi) - jnp.pi


class EncoderBlock(nn.Module):
    """Post-LN transformer encoder block (PyTorch ``TransformerEncoderLayer``
    semantics: attn → dropout → residual → LN, FFN(4d, relu) → … → LN)."""

    d_model: int
    n_heads: int
    dropout: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            qkv_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            dtype=self.dtype,
        )(x, x)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        x = nn.LayerNorm(dtype=self.dtype)(x + attn)

        h = nn.Dense(4 * self.d_model, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.d_model, dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(dtype=self.dtype)(x + h)


class UniversalQOCTransformer(nn.Module):
    """SCORE-embedding transformer pulse generator.

    Attributes mirror the reference constructor (universal_model.py:28-77);
    ``n_layers=None`` falls back to ``4 * max_pulses`` (reference :67-68).
    """

    num_qubits: int = 1
    pulse_space: PulseSpace = (("phi", (-3.15, 3.15)), ("tau", (0.1, 0.5)))
    max_pulses: int = 16
    d_model: int = 256
    n_layers: Optional[int] = 12
    n_heads: int = 4
    dropout: float = 0.1
    finetune: bool = False
    middle_convention: str = "angle"
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def param_dim(self) -> int:
        return len(self.pulse_space)

    @nn.compact
    def __call__(
        self,
        rotation_vector: jax.Array,
        base_pulse: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """``(B, 4)`` rotation vectors → ``(B, max_pulses, P)`` pulses."""
        n_layers = self.n_layers if self.n_layers is not None else 4 * self.max_pulses
        P = self.param_dim

        tokens, phi_offset = score_features(
            rotation_vector.astype(jnp.float32), self.middle_convention
        )  # (B, 9, 8), (B,)
        L_tok = tokens.shape[-2]

        emb = nn.Dense(self.d_model, dtype=self.dtype, name="unitary_proj")(
            tokens.astype(self.dtype)
        )
        pe = sinusoidal_positional_encoding(L_tok, self.d_model)
        emb = emb + pe.astype(self.dtype)[None]

        x = emb
        for i in range(n_layers):
            x = EncoderBlock(
                d_model=self.d_model,
                n_heads=self.n_heads,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"encoder_{i}",
            )(x, deterministic=deterministic)

        # last-token readout → normalized pulse logits (reference :120-126)
        logits = nn.Dense(self.max_pulses * P, dtype=jnp.float32, name="head")(
            x[:, -1, :].astype(jnp.float32)
        )
        pulses_norm = logits.reshape(-1, self.max_pulses, P)

        low = jnp.asarray([lo for _, (lo, _) in self.pulse_space], jnp.float32)
        high = jnp.asarray([hi for _, (_, hi) in self.pulse_space], jnp.float32)
        pulses = low + (high - low) * jax.nn.sigmoid(pulses_norm)

        if self.finetune:
            if base_pulse is None:
                raise ValueError(
                    "finetune=True requires an explicit base_pulse array "
                    "(the reference torch.load inside forward — "
                    "universal_model.py:135-138 — is intentionally not kept)"
                )
            pulses = 0.2 * pulses + base_pulse

        # τ ≥ 0, φ-offset equivariance, wrap φ to (−π, π]  (reference :140-143)
        pulses = pulses.at[..., -1].set(nn.relu(pulses[..., -1]))
        pulses = pulses.at[..., 0].add(phi_offset[:, None])
        pulses = pulses.at[..., 0].set(wrap_angle(pulses[..., 0]))
        return pulses
