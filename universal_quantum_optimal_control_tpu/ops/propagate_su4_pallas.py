r"""Fused Pallas SU(4) propagator — two-qubit Monte-Carlo evaluation kernel.

The XLA path (:mod:`..core.su4`) evaluates the segment exponential and the
running product as batched ``(..., 4, 4)`` complex-pair matmuls.  On TPU that
layout is hostile to the VPU: the 4×4 matrix occupies the lane axis (4 of 128
lanes live), so arithmetic runs at ~3% lane utilization.  This kernel flips
the layout to structure-of-arrays: each of the 32 real numbers of a (re, im)
4×4 unitary is a ``(rows, 128)`` vector over Monte-Carlo samples, and every
4×4 complex matmul becomes 64 fully-vectorized FMA chains.  The running
product stays in registers across a ``fori_loop`` over the L segments; the
current target's (1, L) pulse rows stream into SMEM per grid step (SMEM use
is O(L) regardless of the target batch).

Same physics contract as ``core.su4`` (which remains the autodiff/training
path and the correctness oracle):

    H(φ; δ₁, δ₂, ε) = ½(1+ε)·Ω·[cosφ·X₁ + sinφ·Y₁ + χ(cosφ·X₂ + sinφ·Y₂)]
                      + ½(δ₁·Z₁ + δ₂·Z₂) + J·Z₁Z₂

H is sparse in the computational basis — 4 real diagonals and two complex
couplings G₁ = amp·e^{-iφ} (X₁Y₁ block) and G₂ = χ·amp·e^{-iφ} (X₂Y₂ block) —
so building A = −i·H·τ/2^s costs ~20 vector ops; the degree-8 Paterson–
Stockmeyer Taylor + 4 squarings (matching ``su4.expm_taylor_ri`` exactly)
then costs 9 SoA matmuls per segment.

Forward/evaluation only (robustness curves, contours, MC sweeps): training
differentiates the XLA path.  Reference being replaced: the advertised
two-qubit workload (reference README.md:87, no code shipped).
"""

from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import su4

__all__ = ["propagate_su4_mc_pallas", "mean_fidelity_su4_pallas",
           "mean_fidelity_su4_pallas_with_product"]

LANES = 128
_DEF_ROWS = 8  # ~250 live (rows, 128) f32 registers/tile → 1 MB VMEM at 8


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# SoA 4×4 complex algebra: matrices are [4][4] lists of (rows, LANES) arrays
# ---------------------------------------------------------------------------


def _zeros_like_mat(x) -> List[List[jax.Array]]:
    z = jnp.zeros_like(x)
    return [[z for _ in range(4)] for _ in range(4)]


def _eye_like(x) -> Tuple[List[List[jax.Array]], List[List[jax.Array]]]:
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    er = [[one if r == c else zero for c in range(4)] for r in range(4)]
    ei = [[zero for _ in range(4)] for _ in range(4)]
    return er, ei


def _matmul_soa(ar, ai, br, bi):
    """(ar + i·ai) @ (br + i·bi) on SoA 4×4; 64 vector FMA chains."""
    cr = [[None] * 4 for _ in range(4)]
    ci = [[None] * 4 for _ in range(4)]
    for r in range(4):
        for c in range(4):
            re = ar[r][0] * br[0][c] - ai[r][0] * bi[0][c]
            im = ar[r][0] * bi[0][c] + ai[r][0] * br[0][c]
            for k in range(1, 4):
                re += ar[r][k] * br[k][c] - ai[r][k] * bi[k][c]
                im += ar[r][k] * bi[k][c] + ai[r][k] * br[k][c]
            cr[r][c] = re
            ci[r][c] = im
    return cr, ci


def _lincomb(coeffs_mats):
    """Σ cₖ·Mₖ elementwise over SoA matrices; skips None entries."""
    out = None
    for coeff, mat in coeffs_mats:
        if mat is None:
            continue
        if out is None:
            out = [[coeff * mat[r][c] for c in range(4)] for r in range(4)]
        else:
            out = [[out[r][c] + coeff * mat[r][c] for c in range(4)]
                   for r in range(4)]
    return out


_C = [1.0 / math.factorial(k) for k in range(9)]


def _expm_ps8_soa(ar, ai, scaling: int):
    """exp(A) for SoA A via the order-8 Paterson–Stockmeyer Taylor + repeated
    squaring — term-for-term identical to ``su4.expm_taylor_ri`` (order=8)."""
    er, ei = _eye_like(ar[0][0])
    a2r, a2i = _matmul_soa(ar, ai, ar, ai)
    a3r, a3i = _matmul_soa(a2r, a2i, ar, ai)
    a4r, a4i = _matmul_soa(a2r, a2i, a2r, a2i)
    pr = _lincomb([(_C[0], er), (_C[1], ar), (_C[2], a2r), (_C[3], a3r)])
    pi = _lincomb([(_C[1], ai), (_C[2], a2i), (_C[3], a3i)])
    if pi is None:
        pi = _zeros_like_mat(ar[0][0])
    qr = _lincomb([(_C[4], er), (_C[5], ar), (_C[6], a2r), (_C[7], a3r),
                   (_C[8], a4r)])
    qi = _lincomb([(_C[5], ai), (_C[6], a2i), (_C[7], a3i), (_C[8], a4i)])
    mr, mi = _matmul_soa(a4r, a4i, qr, qi)
    ur = [[pr[r][c] + mr[r][c] for c in range(4)] for r in range(4)]
    ui = [[pi[r][c] + mi[r][c] for c in range(4)] for r in range(4)]
    for _ in range(scaling):
        ur, ui = _matmul_soa(ur, ui, ur, ui)
    return ur, ui


# off-diagonal coupling pattern: (row, col, which, im_sign).  The upper
# entries hold G = amp·e^{-iφ} (im_sign +1: H_im = +gᵢ), the lower ones
# conj(G) (im_sign −1); A = −i·H·t ⇒ A_re = im_sign·gᵢ·t, A_im = −g_r·t.
_COUPLINGS = [
    (0, 1, "g2", 1.0), (1, 0, "g2", -1.0), (2, 3, "g2", 1.0),
    (3, 2, "g2", -1.0),
    (0, 2, "g1", 1.0), (2, 0, "g1", -1.0), (1, 3, "g1", 1.0),
    (3, 1, "g1", -1.0),
]


def _segment_body(phi, omega, tau, d1, d2, eps, ur, ui, *, xtalk, coupling,
                  scaling, phi2=None):
    """One segment: build A = −i·H·τ/2^s sparsely, exponentiate, compose.

    ``phi2`` (drive2 variant): second direct drive line on qubit 2 with
    symmetric cross-talk — G₁ = amp·(e^{−iφ₁} + χe^{−iφ₂}),
    G₂ = amp·(χe^{−iφ₁} + e^{−iφ₂}) (matches ``su4.su4_hamiltonian``)."""
    c = jnp.cos(phi)
    s = jnp.sin(phi)
    amp = 0.5 * (1.0 + eps) * jnp.maximum(omega, 0.0)
    # diagonals of H: ½δ₁z₁ + ½δ₂z₂ + J·z₁z₂ with z-patterns per basis state
    diag = [0.5 * (d1 + d2) + coupling, 0.5 * (d1 - d2) - coupling,
            0.5 * (d2 - d1) - coupling, -0.5 * (d1 + d2) + coupling]
    # drive envelopes e₁ = e^{-iφ₁} + χe^{-iφ₂}, e₂ = χe^{-iφ₁} + e^{-iφ₂}
    # combined at SCALAR width (φ, φ₂ are per-segment SMEM scalars), so the
    # drive2 variant pays the same 4 per-sample vector multiplies as base
    if phi2 is not None:
        c2 = jnp.cos(phi2)
        s2 = jnp.sin(phi2)
        e1r, e1i = c + xtalk * c2, -(s + xtalk * s2)
        e2r, e2i = xtalk * c + c2, -(xtalk * s + s2)
    else:
        e1r, e1i = c, -s
        e2r, e2i = xtalk * c, -(xtalk * s)
    g1r, g1i = amp * e1r, amp * e1i
    g2r, g2i = amp * e2r, amp * e2i
    t = tau / (2.0 ** scaling)
    # A = −i·H·t ⇒ Ar = Hi·t, Ai = −Hr·t
    zero = jnp.zeros_like(d1)
    arr = [[zero for _ in range(4)] for _ in range(4)]
    aii = [[zero for _ in range(4)] for _ in range(4)]
    for k in range(4):
        aii[k][k] = -diag[k] * t
    for r, cc, which, sgn in _COUPLINGS:
        hr = g1r if which == "g1" else g2r
        hi = g1i if which == "g1" else g2i
        arr[r][cc] = sgn * hi * t
        aii[r][cc] = -hr * t
    sr, si = _expm_ps8_soa(arr, aii, scaling)
    return _matmul_soa(sr, si, ur, ui)


def _propagate_loop(pulse_refs, b, d1, d2, eps, L, *, xtalk,
                    coupling, scaling):
    """``pulse_refs``: (φ, Ω, τ) SMEM tables, or (φ₁, φ₂, Ω, τ) in drive2
    mode (4 refs ⇒ drive2)."""
    drive2 = len(pulse_refs) == 4
    if drive2:
        phi_ref, phi2_ref, om_ref, tau_ref = pulse_refs
    else:
        phi_ref, om_ref, tau_ref = pulse_refs
    er, ei = _eye_like(d1)

    def body(k, carry):
        ur, ui = _unflatten(carry)
        ur, ui = _segment_body(
            phi_ref[0, 0, k], om_ref[0, 0, k], tau_ref[0, 0, k], d1, d2, eps, ur, ui,
            xtalk=xtalk, coupling=coupling, scaling=scaling,
            phi2=(phi2_ref[0, 0, k] if drive2 else None))
        return _flatten(ur, ui)

    flat = jax.lax.fori_loop(0, L, body, _flatten(er, ei))
    return _unflatten(flat)


def _flatten(ur, ui):
    return tuple(ur[r][c] for r in range(4) for c in range(4)) + \
        tuple(ui[r][c] for r in range(4) for c in range(4))


def _unflatten(flat):
    ur = [[flat[4 * r + c] for c in range(4)] for r in range(4)]
    ui = [[flat[16 + 4 * r + c] for c in range(4)] for r in range(4)]
    return ur, ui


def _prop_kernel(*refs, L, xtalk, coupling, scaling):
    *pulse_refs, d1_ref, d2_ref, eps_ref, out_ref = refs
    ur, ui = _propagate_loop(tuple(pulse_refs), 0, d1_ref[0],
                             d2_ref[0], eps_ref[0], L, xtalk=xtalk,
                             coupling=coupling, scaling=scaling)
    for r in range(4):
        for c in range(4):
            out_ref[0, 4 * r + c] = ur[r][c]
            out_ref[0, 16 + 4 * r + c] = ui[r][c]


def _fid_kernel(*refs, L, xtalk, coupling, scaling, M_valid, tile_rows):
    *pulse_refs, tr_ref, ti_ref, d1_ref, d2_ref, eps_ref, sum_ref = refs
    j = pl.program_id(1)
    ur, ui = _propagate_loop(tuple(pulse_refs), 0, d1_ref[0],
                             d2_ref[0], eps_ref[0], L, xtalk=xtalk,
                             coupling=coupling, scaling=scaling)
    # Tr(U†T) = Σ_{rc} conj(U)·T; entanglement fidelity (|Tr|² + 4)/20
    re = jnp.zeros_like(d1_ref[0])
    im = jnp.zeros_like(d1_ref[0])
    for r in range(4):
        for c in range(4):
            tr = tr_ref[0, 0, 4 * r + c]
            ti = ti_ref[0, 0, 4 * r + c]
            re += ur[r][c] * tr + ui[r][c] * ti
            im += ur[r][c] * ti - ui[r][c] * tr
    F = (re * re + im * im + 4.0) / 20.0

    if M_valid is not None:
        row = jax.lax.broadcasted_iota(jnp.int32, F.shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, F.shape, 1)
        idx = (j * tile_rows + row) * LANES + lane
        F = jnp.where(idx < M_valid, F, 0.0)

    @pl.when(j == 0)
    def _():
        sum_ref[0, 0, 0] = 0.0

    sum_ref[0, 0, 0] += jnp.sum(F)


def _fid_prod_kernel(*refs, L, xtalk, coupling, scaling, M_valid, tile_rows):
    """`_fid_kernel` that ALSO writes the per-sample product U to HBM.

    The product is the forward's own final carry — emitting it costs only
    the (B·M·32·4 B) store, and lets the fused VJP kernel skip its 9·L-matmul
    forward-product rebuild (see ``propagate_su4_pallas_bwd``)."""
    (*pulse_refs, tr_ref, ti_ref, d1_ref, d2_ref, eps_ref,
     sum_ref, prod_ref) = refs
    j = pl.program_id(1)
    ur, ui = _propagate_loop(tuple(pulse_refs), 0, d1_ref[0],
                             d2_ref[0], eps_ref[0], L, xtalk=xtalk,
                             coupling=coupling, scaling=scaling)
    for r in range(4):
        for c in range(4):
            prod_ref[0, 4 * r + c] = ur[r][c]
            prod_ref[0, 16 + 4 * r + c] = ui[r][c]
    re = jnp.zeros_like(d1_ref[0])
    im = jnp.zeros_like(d1_ref[0])
    for r in range(4):
        for c in range(4):
            tr = tr_ref[0, 0, 4 * r + c]
            ti = ti_ref[0, 0, 4 * r + c]
            re += ur[r][c] * tr + ui[r][c] * ti
            im += ur[r][c] * ti - ui[r][c] * tr
    F = (re * re + im * im + 4.0) / 20.0

    if M_valid is not None:
        row = jax.lax.broadcasted_iota(jnp.int32, F.shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, F.shape, 1)
        idx = (j * tile_rows + row) * LANES + lane
        F = jnp.where(idx < M_valid, F, 0.0)

    @pl.when(j == 0)
    def _():
        sum_ref[0, 0, 0] = 0.0

    sum_ref[0, 0, 0] += jnp.sum(F)


def _pad_mc(*arrays):
    # Rows beyond one native tile are rounded to a multiple of 8: Mosaic
    # needs the second-minor block dim to divide by 8 or equal the array
    # dim (see the SU(2) twin in propagate_pallas.py for the full note).
    M = arrays[0].shape[1]
    Mp = -(-M // LANES) * LANES
    if Mp // LANES > 8:
        Mp = -(-Mp // (8 * LANES)) * (8 * LANES)
    if Mp == M:
        return arrays + (M,)
    out = [jnp.pad(a, [(0, 0), (0, Mp - M)]) for a in arrays]
    return tuple(out) + (M,)


def _mc_grid(M: int, tile_rows: int) -> Tuple[int, int, int]:
    rows = M // LANES
    tr = min(tile_rows, rows)
    while rows % tr != 0:
        tr //= 2
    tr = max(tr, 1)
    return rows, tr, rows // tr


def _split_pulses(pulses, drive2=False):
    """(B, L, P) → pulse tables: (φ, Ω, τ) with Ω ≡ 1 for 2-parameter
    spaces, or (φ₁, φ₂, Ω, τ) when ``drive2`` (P must be 4)."""
    P = pulses.shape[-1]
    phi = pulses[..., 0]
    tau = pulses[..., -1]
    if drive2:
        if P != 4:
            raise ValueError(
                f"drive2 expects 4-parameter pulses (phi1, phi2, omega, "
                f"tau); got P={P}")
        return phi, pulses[..., 1], pulses[..., 2], tau
    if P == 4:
        raise ValueError("4-parameter pulses require drive2=True")
    om = pulses[..., 1] if P == 3 else jnp.ones_like(phi)
    return phi, om, tau


@functools.partial(jax.jit,
                   static_argnames=("xtalk", "coupling", "scaling",
                                    "tile_rows", "drive2"))
def propagate_su4_mc_pallas(pulses, delta1, delta2, epsilon, *, xtalk=0.1,
                            coupling=0.5, scaling=4,
                            tile_rows=_DEF_ROWS, drive2=False):
    """(B, L, P) pulses × (B, M) disorder → (re, im) pair of (B, M, 4, 4).

    Drop-in SoA-kernel counterpart of :func:`..core.su4.propagate_su4_mc`
    (pass ``xtalk``/``coupling``/``drive2`` from the
    :class:`TwoQubitSystem`).  Forward/evaluation only.
    """
    B, L, _ = pulses.shape
    cols = _split_pulses(pulses, drive2)
    delta1, delta2, epsilon, M_orig = _pad_mc(delta1, delta2, epsilon)
    M = delta1.shape[1]
    rows, tr, ntiles = _mc_grid(M, tile_rows)
    d1 = delta1.reshape(B, rows, LANES)
    d2 = delta2.reshape(B, rows, LANES)
    ep = epsilon.reshape(B, rows, LANES)

    cols = tuple(c[:, None, :] for c in cols)  # (B, 1, L)
    # per-target (1, 1, L) SMEM streaming (unit middle axis satisfies
    # Mosaic's trailing-dims block rule) — same pattern as the SU(2) twin
    smem = lambda: pl.BlockSpec((1, 1, L), lambda b, j: (b, 0, 0),
                                memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec((1, tr, LANES), lambda b, j: (b, j, 0),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_prop_kernel, L=L, xtalk=xtalk, coupling=coupling,
                          scaling=scaling),
        grid=(B, ntiles),
        in_specs=[*([smem()] * len(cols)), vmem(), vmem(), vmem()],
        out_specs=pl.BlockSpec((1, 32, tr, LANES), lambda b, j: (b, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 32, rows, LANES), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * M * L * 4700, transcendentals=B * L * 2,
            bytes_accessed=B * (L * 12 + M * 12 + M * 128),
        ),
        interpret=_interpret(),
    )(*cols, d1, d2, ep)
    # register layout is [16 × re][16 × im]
    out = jnp.moveaxis(out, 1, -1).reshape(B, M, 2, 4, 4)[:, :M_orig]
    return out[..., 0, :, :], out[..., 1, :, :]


@functools.partial(jax.jit,
                   static_argnames=("xtalk", "coupling", "scaling",
                                    "tile_rows", "drive2"))
def mean_fidelity_su4_pallas(pulses, target_re, target_im, delta1, delta2,
                             epsilon, *, xtalk=0.1, coupling=0.5, scaling=4,
                             tile_rows=_DEF_ROWS, drive2=False):
    """Fully fused two-qubit objective: ``(B,) E_M[F]``.

    ``pulses (B,L,P)``, ``target_re/im (B,4,4)``, disorder ``(B,M)`` —
    propagation, entanglement fidelity (``su4.fidelity_su4_ri``) and the MC
    mean all reduce on-chip; only B scalars leave.
    """
    B, L, _ = pulses.shape
    cols = _split_pulses(pulses, drive2)
    delta1, delta2, epsilon, M_orig = _pad_mc(delta1, delta2, epsilon)
    M = delta1.shape[1]
    rows, tr, ntiles = _mc_grid(M, tile_rows)
    d1 = delta1.reshape(B, rows, LANES)
    d2 = delta2.reshape(B, rows, LANES)
    ep = epsilon.reshape(B, rows, LANES)
    t_r = target_re.reshape(B, 1, 16)
    t_i = target_im.reshape(B, 1, 16)

    cols = tuple(c[:, None, :] for c in cols)  # (B, 1, L)
    # per-target (1, 1, ·) SMEM streaming — see the SU(2) twin for the rule
    smem_bl = lambda: pl.BlockSpec((1, 1, L), lambda b, j: (b, 0, 0),
                                   memory_space=pltpu.SMEM)
    smem_bt = lambda: pl.BlockSpec((1, 1, 16), lambda b, j: (b, 0, 0),
                                   memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec((1, tr, LANES), lambda b, j: (b, j, 0),
                                memory_space=pltpu.VMEM)
    sums = pl.pallas_call(
        functools.partial(_fid_kernel, L=L, xtalk=xtalk, coupling=coupling,
                          scaling=scaling,
                          M_valid=(M_orig if M_orig != M else None),
                          tile_rows=tr),
        grid=(B, ntiles),
        in_specs=[*([smem_bl()] * len(cols)), smem_bt(), smem_bt(),
                  vmem(), vmem(), vmem()],
        out_specs=pl.BlockSpec((1, 1, 1), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * M * (L * 4700 + 70), transcendentals=B * L * 2,
            bytes_accessed=B * (L * 12 + M * 12 + 132),
        ),
        interpret=_interpret(),
    )(*cols, t_r, t_i, d1, d2, ep)
    return sums[:, 0, 0] / M_orig


@functools.partial(jax.jit,
                   static_argnames=("xtalk", "coupling", "scaling",
                                    "tile_rows", "drive2"))
def mean_fidelity_su4_pallas_with_product(pulses, target_re, target_im,
                                          delta1, delta2, epsilon, *,
                                          xtalk=0.1, coupling=0.5, scaling=4,
                                          tile_rows=_DEF_ROWS, drive2=False):
    """Fused objective that ALSO returns the per-sample product.

    Same contract as :func:`mean_fidelity_su4_pallas` plus a second output:
    the final product ``U`` per MC sample in the kernel-native padded SoA
    layout ``(B, 32, rows, LANES)`` (``[16 × re][16 × im]``, MC axis padded
    to a lane multiple).  The product is the forward's own final carry, so
    emitting it costs only the HBM store — and it is exactly the residual
    the product-seeded VJP kernel (``su4_objective_vjp_from_product``)
    needs to skip its 9·L-matmul forward-chain rebuild.
    """
    B, L, _ = pulses.shape
    cols = _split_pulses(pulses, drive2)
    delta1, delta2, epsilon, M_orig = _pad_mc(delta1, delta2, epsilon)
    M = delta1.shape[1]
    rows, tr, ntiles = _mc_grid(M, tile_rows)
    d1 = delta1.reshape(B, rows, LANES)
    d2 = delta2.reshape(B, rows, LANES)
    ep = epsilon.reshape(B, rows, LANES)
    t_r = target_re.reshape(B, 1, 16)
    t_i = target_im.reshape(B, 1, 16)

    cols = tuple(c[:, None, :] for c in cols)  # (B, 1, L)
    # per-target (1, 1, ·) SMEM streaming — see the SU(2) twin for the rule
    smem_bl = lambda: pl.BlockSpec((1, 1, L), lambda b, j: (b, 0, 0),
                                   memory_space=pltpu.SMEM)
    smem_bt = lambda: pl.BlockSpec((1, 1, 16), lambda b, j: (b, 0, 0),
                                   memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec((1, tr, LANES), lambda b, j: (b, j, 0),
                                memory_space=pltpu.VMEM)
    sums, prod = pl.pallas_call(
        functools.partial(_fid_prod_kernel, L=L, xtalk=xtalk,
                          coupling=coupling, scaling=scaling,
                          M_valid=(M_orig if M_orig != M else None),
                          tile_rows=tr),
        grid=(B, ntiles),
        in_specs=[*([smem_bl()] * len(cols)), smem_bt(), smem_bt(),
                  vmem(), vmem(), vmem()],
        out_specs=(
            pl.BlockSpec((1, 1, 1), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 32, tr, LANES), lambda b, j: (b, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 32, rows, LANES), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * M * (L * 4700 + 70), transcendentals=B * L * 2,
            bytes_accessed=B * (L * 12 + M * 12 + M * 128 + 132),
        ),
        interpret=_interpret(),
    )(*cols, t_r, t_i, d1, d2, ep)
    return sums[:, 0, 0] / M_orig, prod
