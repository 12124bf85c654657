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

import itertools

import numpy as np

from .score_embedding import sinusoidal_positional_encoding
from .universal_transformer import EncoderBlock, PulseSpace, wrap_angle

__all__ = ["TwoQubitQOCTransformer", "transfer_encoder_params",
           "unitary_tokens", "makhlin_invariants_ri"]


def unitary_tokens(packed_target: jax.Array) -> jax.Array:
    """Packed targets ``(B, 2, 4, 4)`` (re, im) → row tokens ``(B, 4, 8)``.

    Token i carries row i of the target: interleaved ``(re, im)`` pairs of
    its 4 entries.
    """
    re = packed_target[:, 0]  # (B, 4, 4)
    im = packed_target[:, 1]
    return jnp.stack([re, im], axis=-1).reshape(*re.shape[:-1], 8)


# ---------------------------------------------------------------------------
# KAK / Cartan featurization (Makhlin local invariants)
# ---------------------------------------------------------------------------

# Magic (Bell) basis: U is locally equivalent to V iff their Makhlin
# invariants agree; m = Mᵀ M with M = Q†UQ is invariant under left/right
# single-qubit rotations up to conjugation, so G1 = tr²(m)/(16·det U) and
# G2 = (tr²(m) − tr(m²))/(4·det U) depend only on the Cartan class
# (c_x, c_y, c_z) of the target — the SU(4) analog of the SCORE embedding's
# rotation-invariant featurization (reference universal_model.py:148-195
# featurizes by Euler class; the reference ships no two-qubit code).
_Q_MAGIC = (1.0 / np.sqrt(2.0)) * np.array(
    [[1, 0, 0, 1j],
     [0, 1j, 1, 0],
     [0, 1j, -1, 0],
     [1, 0, 0, -1j]], dtype=np.complex128)
_QR = np.asarray(_Q_MAGIC.real, np.float32)
_QI = np.asarray(_Q_MAGIC.imag, np.float32)
# 4×4 determinant via permutation expansion (24 terms) — closed form so it
# runs in real (re, im) arithmetic on TPU (complex LU/QR are unimplemented
# on some backends); built at import time on host.
_PERMS = [(p, float(np.linalg.det(np.eye(4)[list(p)])))
          for p in itertools.permutations(range(4))]


def _mm_ri(ar, ai, br, bi):
    P = jax.lax.Precision.HIGHEST
    k1 = jnp.matmul(ar, br + bi, precision=P)
    k2 = jnp.matmul(ar + ai, bi, precision=P)
    k3 = jnp.matmul(ai - ar, br, precision=P)
    return k1 - k2, k1 + k3


def _det4_ri(Ur, Ui):
    """Closed-form complex determinant of ``(..., 4, 4)`` (re, im) pairs."""
    dr = jnp.zeros(Ur.shape[:-2], Ur.dtype)
    di = jnp.zeros(Ur.shape[:-2], Ur.dtype)
    for p, sgn in _PERMS:
        tr_ = Ur[..., 0, p[0]]
        ti_ = Ui[..., 0, p[0]]
        for r in range(1, 4):
            br, bi = Ur[..., r, p[r]], Ui[..., r, p[r]]
            tr_, ti_ = tr_ * br - ti_ * bi, tr_ * bi + ti_ * br
        dr = dr + sgn * tr_
        di = di + sgn * ti_
    return dr, di


def makhlin_invariants_ri(packed_target: jax.Array) -> jax.Array:
    """Packed targets ``(B, 2, 4, 4)`` → Makhlin invariants ``(B, 3)``:
    ``(Re G1, Im G1, Re G2)``.  Pure real arithmetic (TPU-safe)."""
    Ur = packed_target[:, 0]
    Ui = packed_target[:, 1]
    Qr = jnp.asarray(_QR)
    Qi = jnp.asarray(_QI)
    # M = Q† U Q
    Tr_, Ti_ = _mm_ri(Qr.T, -Qi.T, Ur, Ui)
    Mr, Mi = _mm_ri(Tr_, Ti_, Qr, Qi)
    # m = Mᵀ M
    mr, mi = _mm_ri(jnp.swapaxes(Mr, -1, -2), jnp.swapaxes(Mi, -1, -2),
                    Mr, Mi)
    tr_r = jnp.trace(mr, axis1=-2, axis2=-1)
    tr_i = jnp.trace(mi, axis1=-2, axis2=-1)
    tr2_r = tr_r * tr_r - tr_i * tr_i
    tr2_i = 2.0 * tr_r * tr_i
    # tr(m²) = Σᵢⱼ mᵢⱼ·mⱼᵢ
    trm2_r = jnp.sum(mr * jnp.swapaxes(mr, -1, -2)
                     - mi * jnp.swapaxes(mi, -1, -2), axis=(-2, -1))
    trm2_i = 2.0 * jnp.sum(mr * jnp.swapaxes(mi, -1, -2), axis=(-2, -1))
    det_r, det_i = _det4_ri(Ur, Ui)
    inv_d = 1.0 / jnp.maximum(det_r * det_r + det_i * det_i, 1e-12)
    g1_r = (tr2_r * det_r + tr2_i * det_i) * inv_d / 16.0
    g1_i = (tr2_i * det_r - tr2_r * det_i) * inv_d / 16.0
    n_r = tr2_r - trm2_r
    n_i = tr2_i - trm2_i
    g2_r = (n_r * det_r + n_i * det_i) * inv_d / 4.0
    return jnp.stack([g1_r, g1_i, g2_r], axis=-1)


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
    # append a 5th token carrying the Makhlin/KAK local invariants of the
    # target (the SU(4) analog of the SCORE embedding's rotation-class
    # featurization) — the encoder then sees the target's Cartan class
    # explicitly instead of having to infer it from raw matrix entries
    kak_features: bool = False
    # FULL KAK featurization: the input is a precomputed (B, 9, 8) token
    # array from ``data.su4_targets.kak_input_tokens`` (4 raw rows +
    # A₁/A₂/B₁/B₂ local factors + Cartan coordinates) — host preprocessing,
    # exactly the reference's YXY+SCORE philosophy (universal_model.py:
    # 148-195).  Measured necessity: raw-entry input underfits the
    # inverse-KAK map (docs/two_qubit_results.md §Generalization wall).
    kak_tokens: bool = False

    @property
    def param_dim(self) -> int:
        return len(self.pulse_space)

    @nn.compact
    def __call__(self, packed_target: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        """``(B, 2, 4, 4)`` packed targets → ``(B, max_pulses, P)`` pulses.

        With ``kak_tokens`` the input is instead the precomputed ``(B, 9, 8)``
        token array (see class docstring)."""
        P = self.param_dim
        if self.kak_tokens:
            tokens = packed_target.astype(jnp.float32)
            if tokens.ndim != 3 or tokens.shape[-1] != 8:
                raise ValueError(
                    f"kak_tokens expects (B, T, 8) precomputed tokens from "
                    f"data.su4_targets.kak_input_tokens; got shape "
                    f"{tokens.shape}")
        else:
            tokens = unitary_tokens(
                packed_target.astype(jnp.float32))  # (B, 4, 8)
        if self.kak_features and not self.kak_tokens:
            feats = makhlin_invariants_ri(packed_target.astype(jnp.float32))
            pad = jnp.zeros(feats.shape[:-1] + (8 - feats.shape[-1],),
                            jnp.float32)
            tokens = jnp.concatenate(
                [tokens, jnp.concatenate([feats, pad], -1)[:, None, :]], 1)
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
                            dst_params: Dict[str, Any],
                            also: tuple = ()) -> Dict[str, Any]:
    """Copy every shape-matching encoder block from a single-qubit checkpoint
    into a two-qubit parameter tree (the "finetuned single-qubit pretraining"
    path of BASELINE.json configs[4]).

    Projection and head layers keep the destination init (their input/output
    dims differ between the tasks); ``also`` names additional top-level
    modules to copy when shapes match (e.g. ``("unitary_proj",)`` for
    same-featurization transfers such as single-qubit P=2 → P=4).
    Returns a new parameter tree.
    """
    src = src_params["params"] if "params" in src_params else src_params
    dst_outer = dict(dst_params)
    dst = dict(dst_outer.get("params", dst_outer))

    transferred = 0
    for name, sub in src.items():
        if not (name.startswith("encoder_") or name in also) \
                or name not in dst:
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
