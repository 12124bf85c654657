r"""Two-qubit universal pulse model + single-qubit pretraining transfer.

The reference advertises a two-qubit workload with finetuned single-qubit
pretraining (README.md:87; BASELINE.json configs[4]) but ships no code — this
module defines it.  The target SU(4) unitary is featurized as 4 row-tokens of
interleaved (re, im) entries (the two-qubit analog of the reference's
flattened-unitary featurization, universal_model.py:299-308), encoded by the
SAME post-LN transformer stack as the single-qubit model — so a single-qubit
checkpoint's encoder can be transplanted (:func:`transfer_encoder_params`)
and finetuned on the two-qubit task.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from .score_embedding import sinusoidal_positional_encoding
from .universal_transformer import EncoderBlock, PulseSpace, wrap_angle

__all__ = ["TwoQubitQOCTransformer", "transfer_encoder_params",
           "unitary_tokens"]


def unitary_tokens(packed_target: jax.Array) -> jax.Array:
    """Packed targets ``(B, 2, 4, 4)`` (re, im) → row tokens ``(B, 4, 8)``.

    Token i carries row i of the target: interleaved ``(re, im)`` pairs of
    its 4 entries.
    """
    re = packed_target[:, 0]  # (B, 4, 4)
    im = packed_target[:, 1]
    return jnp.stack([re, im], axis=-1).reshape(*re.shape[:-1], 8)


class TwoQubitQOCTransformer(nn.Module):
    """SU(4)-target transformer pulse generator.

    Same encoder geometry as :class:`UniversalQOCTransformer` (d_model,
    heads, post-LN blocks) so encoder parameters transfer 1:1 from a
    single-qubit checkpoint.
    """

    pulse_space: PulseSpace = (("phi", (-3.15, 3.15)), ("tau", (0.1, 0.5)))
    max_pulses: int = 16
    d_model: int = 256
    n_layers: int = 12
    n_heads: int = 4
    dropout: float = 0.1
    num_qubits: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def param_dim(self) -> int:
        return len(self.pulse_space)

    @nn.compact
    def __call__(self, packed_target: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        """``(B, 2, 4, 4)`` packed targets → ``(B, max_pulses, P)`` pulses."""
        P = self.param_dim
        tokens = unitary_tokens(packed_target.astype(jnp.float32))  # (B, 4, 8)
        L_tok = tokens.shape[-2]

        emb = nn.Dense(self.d_model, dtype=self.dtype, name="unitary_proj")(
            tokens.astype(self.dtype))
        pe = sinusoidal_positional_encoding(L_tok, self.d_model)
        emb = emb + pe.astype(self.dtype)[None]

        x = emb
        for i in range(self.n_layers):
            x = EncoderBlock(
                d_model=self.d_model, n_heads=self.n_heads,
                dropout=self.dropout, dtype=self.dtype,
                name=f"encoder_{i}",
            )(x, deterministic=deterministic)

        logits = nn.Dense(self.max_pulses * P, dtype=jnp.float32,
                          name="head")(x[:, -1, :].astype(jnp.float32))
        pulses_norm = logits.reshape(-1, self.max_pulses, P)

        low = jnp.asarray([lo for _, (lo, _) in self.pulse_space], jnp.float32)
        high = jnp.asarray([hi for _, (_, hi) in self.pulse_space], jnp.float32)
        pulses = low + (high - low) * jax.nn.sigmoid(pulses_norm)
        pulses = pulses.at[..., -1].set(nn.relu(pulses[..., -1]))
        pulses = pulses.at[..., 0].set(wrap_angle(pulses[..., 0]))
        return pulses


def transfer_encoder_params(src_params: Dict[str, Any],
                            dst_params: Dict[str, Any]) -> Dict[str, Any]:
    """Copy every shape-matching encoder block from a single-qubit checkpoint
    into a two-qubit parameter tree (the "finetuned single-qubit pretraining"
    path of BASELINE.json configs[4]).

    Projection and head layers keep the destination init (their input/output
    dims differ between the tasks).  Returns a new parameter tree.
    """
    src = src_params["params"] if "params" in src_params else src_params
    dst_outer = dict(dst_params)
    dst = dict(dst_outer.get("params", dst_outer))

    transferred = 0
    for name, sub in src.items():
        if not name.startswith("encoder_") or name not in dst:
            continue
        src_leaves = jax.tree_util.tree_leaves(sub)
        dst_leaves = jax.tree_util.tree_leaves(dst[name])
        if len(src_leaves) == len(dst_leaves) and all(
                a.shape == b.shape for a, b in zip(src_leaves, dst_leaves)):
            dst[name] = jax.tree_util.tree_map(jnp.asarray, sub)
            transferred += 1
    if transferred == 0:
        raise ValueError(
            "no encoder blocks transferred — check that d_model/n_heads "
            "match between the single- and two-qubit models")
    if "params" in dst_outer:
        dst_outer["params"] = dst
        return dst_outer
    return dst
