r"""Fused Pallas backward kernel for the two-qubit (SU(4)) MC objective.

VJP of ``mean_fidelity_su4_pallas`` with O(1) stored residuals: the XLA scan
VJP stores L per-segment carries; this kernel reconstructs the right prefix
``R_k = U_{k-1} ⋯ U_1`` by *inverse* products from the full product (unitary:
``U⁻¹ = U^H``) and maintains the conjugated left suffix on the fly — the
SU(4) analog of :mod:`.propagate_pallas_bwd` (quaternions → 4×4 (re, im)
SoA matrices, MC samples on VPU lanes).

Math.  With ``U = L_k U_k R_k`` and output cotangent ``G`` (a complex 4×4
per sample, from the fidelity terms), the cotangent of segment k under the
real inner product ``Re⟨G, ·⟩`` is ``Ĝ_k = L_k^H G R_k^H`` (the map
``U_k ↦ L U_k R`` is complex-linear).  Chaining through the segment
exponential ``U_k = (T₈(A))^{2^s}``, ``A = −i·H·τ/2^s``:

* squarings ``S_{j+1} = S_j²``: ``C_j = S_j^H C_{j+1} + C_{j+1} S_j^H``
  (the S_j chain is recomputed in registers — nothing is stored in HBM);
* Paterson–Stockmeyer ``T₈ = P + A₄·Q`` with P, Q cubics in A, A₂, A₃:
  standard product-rule adjoints (8 SoA matmuls);
* the sparse Hamiltonian build: per-segment scalars (φ, Ω, τ) reduce over
  the sample tile into SMEM accumulators; per-sample channels (δ₁, δ₂, ε)
  accumulate across segments in registers.

Backward cost ≈ 3× the forward kernel's matmuls per segment, matching the
SU(2) fused VJP's ratio.  Training path: wrapped in ``jax.custom_vjp`` by
:func:`mean_fidelity_su4_trainable` (fwd = the fused forward objective).

Replaces: autodiff through the reference's ``torch.linalg.matrix_exp``
segment chain (the reference ships no two-qubit code — README.md:87).
"""

from __future__ import annotations

import functools
import math
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .propagate_su4_pallas import (
    _COUPLINGS,
    _DEF_ROWS,
    LANES,
    _eye_like,
    _expm_ps8_soa,
    _interpret,
    _matmul_soa,
    _mc_grid,
    _pad_mc,
    _split_pulses,
    mean_fidelity_su4_pallas,
    mean_fidelity_su4_pallas_with_product,
)

__all__ = ["su4_objective_vjp_pallas", "su4_objective_vjp_from_product",
           "mean_fidelity_su4_trainable"]

_C = [1.0 / math.factorial(k) for k in range(9)]


def _conjT(ar, ai):
    """Conjugate transpose on SoA matrices (free index shuffle)."""
    return ([[ar[c][r] for c in range(4)] for r in range(4)],
            [[-ai[c][r] for c in range(4)] for r in range(4)])


def _madd(a, b):
    return [[a[r][c] + b[r][c] for c in range(4)] for r in range(4)]


def _mscale(s, a):
    return [[s * a[r][c] for c in range(4)] for r in range(4)]


def _build_A(phi, omega, tau, d1, d2, eps, *, xtalk, coupling, scaling,
             phi2=None):
    """Sparse ``A = −i·H·τ/2^s`` plus the pieces the VJP reuses.

    Returns (Ar, Ai, K-pieces): K = −i·H so A = t·K with t = τ/2^s.
    ``phi2`` (drive2): G₁ = amp·(e^{−iφ₁} + χe^{−iφ₂}),
    G₂ = amp·(χe^{−iφ₁} + e^{−iφ₂}) — matches the forward kernel and
    ``su4.su4_hamiltonian``.
    """
    c = jnp.cos(phi)
    s = jnp.sin(phi)
    relu_om = jnp.maximum(omega, 0.0)
    amp = 0.5 * (1.0 + eps) * relu_om
    diag = [0.5 * (d1 + d2) + coupling, 0.5 * (d1 - d2) - coupling,
            0.5 * (d2 - d1) - coupling, -0.5 * (d1 + d2) + coupling]
    # scalar-width envelope combination — see the forward kernel's
    # _segment_body: drive2 pays the same 4 per-sample vector multiplies
    if phi2 is not None:
        c2 = jnp.cos(phi2)
        s2 = jnp.sin(phi2)
        e1r, e1i = c + xtalk * c2, -(s + xtalk * s2)
        e2r, e2i = xtalk * c + c2, -(xtalk * s + s2)
    else:
        c2 = s2 = None
        e1r, e1i = c, -s
        e2r, e2i = xtalk * c, -(xtalk * s)
    g1r, g1i = amp * e1r, amp * e1i
    g2r, g2i = amp * e2r, amp * e2i
    t = tau / (2.0 ** scaling)
    zero = jnp.zeros_like(d1)
    Kr = [[zero for _ in range(4)] for _ in range(4)]
    Ki = [[zero for _ in range(4)] for _ in range(4)]
    for k in range(4):
        Ki[k][k] = -diag[k]
    for r, cc, which, sgn in _COUPLINGS:
        hr = g1r if which == "g1" else g2r
        hi = g1i if which == "g1" else g2i
        Kr[r][cc] = sgn * hi
        Ki[r][cc] = -hr
    Ar = [[Kr[r][cc] * t for cc in range(4)] for r in range(4)]
    Ai = [[Ki[r][cc] * t for cc in range(4)] for r in range(4)]
    return Ar, Ai, Kr, Ki, (c, s, amp, relu_om, t, c2, s2)


def _expm_chain(Ar, Ai, scaling):
    """Forward expm keeping every VJP residual in registers.

    Returns (U, residuals) where residuals = (A2, A3, A4, Q, S-list)."""
    er, ei = _eye_like(Ar[0][0])
    a2r, a2i = _matmul_soa(Ar, Ai, Ar, Ai)
    a3r, a3i = _matmul_soa(a2r, a2i, Ar, Ai)
    a4r, a4i = _matmul_soa(a2r, a2i, a2r, a2i)
    pr = [[_C[0] * er[r][c] + _C[1] * Ar[r][c] + _C[2] * a2r[r][c]
           + _C[3] * a3r[r][c] for c in range(4)] for r in range(4)]
    pi = [[_C[1] * Ai[r][c] + _C[2] * a2i[r][c] + _C[3] * a3i[r][c]
           for c in range(4)] for r in range(4)]
    qr = [[_C[4] * er[r][c] + _C[5] * Ar[r][c] + _C[6] * a2r[r][c]
           + _C[7] * a3r[r][c] + _C[8] * a4r[r][c]
           for c in range(4)] for r in range(4)]
    qi = [[_C[5] * Ai[r][c] + _C[6] * a2i[r][c] + _C[7] * a3i[r][c]
           + _C[8] * a4i[r][c] for c in range(4)] for r in range(4)]
    mr, mi = _matmul_soa(a4r, a4i, qr, qi)
    sr = _madd(pr, mr)
    si = _madd(pi, mi)
    S = [(sr, si)]
    for _ in range(scaling):
        sr, si = _matmul_soa(sr, si, sr, si)
        S.append((sr, si))
    # S[0] = T8(A), S[-1] = U
    return (sr, si), (a2r, a2i, a3r, a3i, a4r, a4i, qr, qi, S)


def _expm_vjp(Cr, Ci, Ar, Ai, residuals):
    """Cotangent of A given cotangent C of U = (T8)^{2^s}."""
    a2r, a2i, a3r, a3i, a4r, a4i, qr, qi, S = residuals
    # through the squarings (reverse)
    for j in range(len(S) - 2, -1, -1):
        sjr, sji = S[j]
        shr, shi = _conjT(sjr, sji)
        t1r, t1i = _matmul_soa(shr, shi, Cr, Ci)
        t2r, t2i = _matmul_soa(Cr, Ci, shr, shi)
        Cr, Ci = _madd(t1r, t2r), _madd(t1i, t2i)
    # through T8 = P + A4 Q
    ahr, ahi = _conjT(Ar, Ai)
    a2hr, a2hi = _conjT(a2r, a2i)
    a4hr, a4hi = _conjT(a4r, a4i)
    qhr, qhi = _conjT(qr, qi)
    dQr, dQi = _matmul_soa(a4hr, a4hi, Cr, Ci)
    dA4r, dA4i = _matmul_soa(Cr, Ci, qhr, qhi)
    dA4r = _madd(dA4r, _mscale(_C[8], dQr))
    dA4i = _madd(dA4i, _mscale(_C[8], dQi))
    dA3r = _madd(_mscale(_C[3], Cr), _mscale(_C[7], dQr))
    dA3i = _madd(_mscale(_C[3], Ci), _mscale(_C[7], dQi))
    dA2r = _madd(_mscale(_C[2], Cr), _mscale(_C[6], dQr))
    dA2i = _madd(_mscale(_C[2], Ci), _mscale(_C[6], dQi))
    dAr = _madd(_mscale(_C[1], Cr), _mscale(_C[5], dQr))
    dAi = _madd(_mscale(_C[1], Ci), _mscale(_C[5], dQi))
    # A4 = A2 @ A2
    t1r, t1i = _matmul_soa(dA4r, dA4i, a2hr, a2hi)
    t2r, t2i = _matmul_soa(a2hr, a2hi, dA4r, dA4i)
    dA2r = _madd(dA2r, _madd(t1r, t2r))
    dA2i = _madd(dA2i, _madd(t1i, t2i))
    # A3 = A2 @ A
    t1r, t1i = _matmul_soa(dA3r, dA3i, ahr, ahi)
    dA2r, dA2i = _madd(dA2r, t1r), _madd(dA2i, t1i)
    t1r, t1i = _matmul_soa(a2hr, a2hi, dA3r, dA3i)
    dAr, dAi = _madd(dAr, t1r), _madd(dAi, t1i)
    # A2 = A @ A
    t1r, t1i = _matmul_soa(dA2r, dA2i, ahr, ahi)
    t2r, t2i = _matmul_soa(ahr, ahi, dA2r, dA2i)
    dAr = _madd(dAr, _madd(t1r, t2r))
    dAi = _madd(dAi, _madd(t1i, t2i))
    return dAr, dAi


def _flatten2(ur, ui):
    return tuple(ur[r][c] for r in range(4) for c in range(4)) + \
        tuple(ui[r][c] for r in range(4) for c in range(4))


def _unflatten2(flat, off=0):
    ur = [[flat[off + 4 * r + c] for c in range(4)] for r in range(4)]
    ui = [[flat[off + 16 + 4 * r + c] for c in range(4)] for r in range(4)]
    return ur, ui


def _param_grads_from_D(Dr, Di, Kr, Ki, scal, eps, zero, *, xtalk, scaling):
    """Chain the expm cotangent ``D = dL/dA`` through the sparse Hamiltonian
    build to the leaf parameters (φ[, φ₂], Ω, τ, δ₁, δ₂, ε) of one segment
    (φ₂ present iff the segment was built with drive2)."""
    c, s, amp, relu_om, t, c2, s2 = scal
    # dτ: A = t·K ⇒ dt = Σ (Dr·Kr + Di·Ki); τ = t·2^s ⇒ dτ = dt/2^s
    dt = zero
    for r in range(4):
        for cc in range(4):
            dt += Dr[r][cc] * Kr[r][cc] + Di[r][cc] * Ki[r][cc]
    dtau_s = dt / (2.0 ** scaling)

    # dK = t·D.  Diagonal: K_ii = −i·diag_i ⇒ ddiag_i = −t·Di[i][i]
    ddg = [-t * Di[i][i] for i in range(4)]
    dd1_s = 0.5 * (ddg[0] + ddg[1] - ddg[2] - ddg[3])
    dd2_s = 0.5 * (ddg[0] - ddg[1] + ddg[2] - ddg[3])
    # couplings: Kr = sgn·h_i, Ki = −h_r per entry
    dh1r = dh1i = dh2r = dh2i = zero
    for r, cc, which, sgn in _COUPLINGS:
        dhr = -t * Di[r][cc]
        dhi = sgn * t * Dr[r][cc]
        if which == "g1":
            dh1r = dh1r + dhr
            dh1i = dh1i + dhi
        else:
            dh2r = dh2r + dhr
            dh2i = dh2i + dhi
    # (g1r, g1i) = amp·(c, −s) [+ χ·amp·(c₂, −s₂)];  g2 = χ·g1 [+ amp·e₂]
    Pc = dh1r + xtalk * dh2r       # cotangent of amp·c
    Ps = dh1i + xtalk * dh2i       # cotangent of −amp·s
    damp = c * Pc - s * Ps
    dphi_s = amp * (-s * Pc - c * Ps)
    dphi2_s = None
    if c2 is not None:             # drive2: the φ₂ channel
        P2c = xtalk * dh1r + dh2r  # cotangent of amp·c₂
        P2s = xtalk * dh1i + dh2i  # cotangent of −amp·s₂
        damp = damp + c2 * P2c - s2 * P2s
        dphi2_s = amp * (-s2 * P2c - c2 * P2s)
    deps_s = 0.5 * relu_om * damp
    dom_s = 0.5 * (1.0 + eps) * jnp.where(relu_om > 0.0, damp, 0.0)
    return dphi_s, dphi2_s, dom_s, dtau_s, dd1_s, dd2_s, deps_s


def _fid_cotangent(Pr, Pi, tr_ref, ti_ref, gbar_ref, b, j, shape_like, *,
                   M_valid, inv_M, tile_rows):
    """Output cotangent G = gbar/M · dF/dU from the final product P.

    F = (re² + im² + 4)/20, re + i·im = Tr(U^H T); padded samples masked."""
    re = jnp.zeros_like(shape_like)
    im = jnp.zeros_like(shape_like)
    T_r = [[tr_ref[0, 0, 4 * r + c] for c in range(4)] for r in range(4)]
    T_i = [[ti_ref[0, 0, 4 * r + c] for c in range(4)] for r in range(4)]
    for r in range(4):
        for c in range(4):
            re += Pr[r][c] * T_r[r][c] + Pi[r][c] * T_i[r][c]
            im += Pr[r][c] * T_i[r][c] - Pi[r][c] * T_r[r][c]
    gF = gbar_ref[0, 0, 0] * inv_M * (2.0 / 20.0)
    if M_valid is not None:
        row = jax.lax.broadcasted_iota(jnp.int32, re.shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, re.shape, 1)
        idx = (j * tile_rows + row) * LANES + lane
        gF = jnp.where(idx < M_valid, gF, 0.0)
    Gr = [[gF * (re * T_r[r][c] + im * T_i[r][c]) for c in range(4)]
          for r in range(4)]
    Gi = [[gF * (re * T_i[r][c] - im * T_r[r][c]) for c in range(4)]
          for r in range(4)]
    return Gr, Gi


def _bwd_kernel(*refs, L, xtalk, coupling, scaling, M_valid, inv_M,
                tile_rows, drive2=False):
    if drive2:
        (phi_ref, phi2_ref, om_ref, tau_ref, tr_ref, ti_ref, gbar_ref,
         d1_ref, d2_ref, eps_ref, dphi_ref, dphi2_ref, dom_ref, dtau_ref,
         dd1_ref, dd2_ref, deps_ref) = refs
    else:
        (phi_ref, om_ref, tau_ref, tr_ref, ti_ref, gbar_ref,
         d1_ref, d2_ref, eps_ref, dphi_ref, dom_ref, dtau_ref,
         dd1_ref, dd2_ref, deps_ref) = refs
        phi2_ref = dphi2_ref = None
    j = pl.program_id(1)
    d1 = d1_ref[0]
    d2 = d2_ref[0]
    eps = eps_ref[0]

    @pl.when(j == 0)
    def _():
        def zero_k(k, _):
            dphi_ref[0, 0, k] = 0.0
            dom_ref[0, 0, k] = 0.0
            dtau_ref[0, 0, k] = 0.0
            if drive2:
                dphi2_ref[0, 0, k] = 0.0
            return 0
        jax.lax.fori_loop(0, L, zero_k, 0)

    def seg_U(k):
        Ar, Ai, Kr, Ki, scal = _build_A(
            phi_ref[0, 0, k], om_ref[0, 0, k], tau_ref[0, 0, k], d1, d2, eps,
            xtalk=xtalk, coupling=coupling, scaling=scaling,
            phi2=(phi2_ref[0, 0, k] if drive2 else None))
        return Ar, Ai, Kr, Ki, scal

    # ---- forward: full product P = U_L ⋯ U_1 -----------------------------
    def fwd_body(k, carry):
        ur, ui = _unflatten2(carry)
        Ar, Ai, _, _, _ = seg_U(k)
        (skr, ski), _ = _expm_chain(Ar, Ai, scaling)
        return _flatten2(*_matmul_soa(skr, ski, ur, ui))

    er, ei = _eye_like(d1)
    P = jax.lax.fori_loop(0, L, fwd_body, _flatten2(er, ei))
    Pr, Pi = _unflatten2(P)

    # ---- output cotangent G from the fidelity ----------------------------
    Gr, Gi = _fid_cotangent(Pr, Pi, tr_ref, ti_ref, gbar_ref, 0, j, d1,
                            M_valid=M_valid, inv_M=inv_M,
                            tile_rows=tile_rows)

    # ---- backward sweep ---------------------------------------------------
    zero = jnp.zeros_like(d1)

    def bwd_body(i, carry):
        k = L - 1 - i
        Pr, Pi = _unflatten2(carry, 0)
        Lhr, Lhi = _unflatten2(carry, 32)
        dd1, dd2, de = carry[64], carry[65], carry[66]

        Ar, Ai, Kr, Ki, scal = seg_U(k)
        (Ukr, Uki), residuals = _expm_chain(Ar, Ai, scaling)
        Uhr, Uhi = _conjT(Ukr, Uki)
        # R = U_k^H P ;  P_{k-1} = R
        Rr, Ri = _matmul_soa(Uhr, Uhi, Pr, Pi)
        # Ĝ = L^H G R^H
        Rhr, Rhi = _conjT(Rr, Ri)
        t1r, t1i = _matmul_soa(Gr, Gi, Rhr, Rhi)
        Cr, Ci = _matmul_soa(Lhr, Lhi, t1r, t1i)
        # VJP through the exponential
        Dr, Di = _expm_vjp(Cr, Ci, Ar, Ai, residuals)

        (dphi_s, dphi2_s, dom_s, dtau_s, dd1_s, dd2_s,
         deps_s) = _param_grads_from_D(
            Dr, Di, Kr, Ki, scal, eps, zero, xtalk=xtalk, scaling=scaling)

        dphi_ref[0, 0, k] += jnp.sum(dphi_s)
        dom_ref[0, 0, k] += jnp.sum(dom_s)
        dtau_ref[0, 0, k] += jnp.sum(dtau_s)
        if drive2:
            dphi2_ref[0, 0, k] += jnp.sum(dphi2_s)

        # update conj-left-suffix: L_{k-1}^H = U_k^H L_k^H
        Lhr2, Lhi2 = _matmul_soa(Uhr, Uhi, Lhr, Lhi)
        return (_flatten2(Rr, Ri) + _flatten2(Lhr2, Lhi2)
                + (dd1 + dd1_s, dd2 + dd2_s, de + deps_s))

    carry = P + _flatten2(er, ei) + (zero, zero, zero)
    carry = jax.lax.fori_loop(0, L, bwd_body, carry)
    dd1_ref[0] = carry[64]
    dd2_ref[0] = carry[65]
    deps_ref[0] = carry[66]


def _bwd_prod_kernel(*refs, L, xtalk, coupling, scaling, M_valid,
                     inv_M, tile_rows, drive2=False):
    """Product-seeded VJP sweep — no forward-chain rebuild.

    The forward objective kernel saved the per-sample product ``P`` to HBM
    (:func:`..propagate_su4_pallas.mean_fidelity_su4_pallas_with_product`),
    so the L-iteration forward rebuild of the plain ``_bwd_kernel`` is
    unnecessary.  The per-segment cotangent ``Ĝ_k = L_k^H G R_k^H`` follows
    the 2-matmul recurrence

        V_L = G·P^H,   Ĝ_k = V_{k+1}·U_k,   V_k = U_k^H·Ĝ_k

    (from ``L_{k-1}^H = U_k^H L_k^H`` and ``R_{k-1}^H = R_k^H U_{k-1}``),
    replacing the 4 product-maintenance matmuls AND the ~10·L-matmul rebuild:
    ~27 vs ~39 SoA matmuls per segment, and a 35- vs 67-register carry.
    """
    if drive2:
        (phi_ref, phi2_ref, om_ref, tau_ref, tr_ref, ti_ref, gbar_ref,
         d1_ref, d2_ref, eps_ref, prod_ref, dphi_ref, dphi2_ref, dom_ref,
         dtau_ref, dd1_ref, dd2_ref, deps_ref) = refs
    else:
        (phi_ref, om_ref, tau_ref, tr_ref, ti_ref, gbar_ref,
         d1_ref, d2_ref, eps_ref, prod_ref, dphi_ref, dom_ref, dtau_ref,
         dd1_ref, dd2_ref, deps_ref) = refs
        phi2_ref = dphi2_ref = None
    j = pl.program_id(1)
    d1 = d1_ref[0]
    d2 = d2_ref[0]
    eps = eps_ref[0]

    @pl.when(j == 0)
    def _():
        def zero_k(k, _):
            dphi_ref[0, 0, k] = 0.0
            dom_ref[0, 0, k] = 0.0
            dtau_ref[0, 0, k] = 0.0
            if drive2:
                dphi2_ref[0, 0, k] = 0.0
            return 0
        jax.lax.fori_loop(0, L, zero_k, 0)

    Pr = [[prod_ref[0, 4 * r + c] for c in range(4)] for r in range(4)]
    Pi = [[prod_ref[0, 16 + 4 * r + c] for c in range(4)] for r in range(4)]
    Gr, Gi = _fid_cotangent(Pr, Pi, tr_ref, ti_ref, gbar_ref, 0, j, d1,
                            M_valid=M_valid, inv_M=inv_M,
                            tile_rows=tile_rows)
    # recurrence seed: V_L = G·P^H (Ĝ for the top segment is V_L·U_L)
    Phr, Phi = _conjT(Pr, Pi)
    Vr, Vi = _matmul_soa(Gr, Gi, Phr, Phi)
    zero = jnp.zeros_like(d1)

    def bwd_body(i, carry):
        k = L - 1 - i
        Vr, Vi = _unflatten2(carry, 0)
        dd1, dd2, de = carry[32], carry[33], carry[34]

        Ar, Ai, Kr, Ki, scal = _build_A(
            phi_ref[0, 0, k], om_ref[0, 0, k], tau_ref[0, 0, k], d1, d2, eps,
            xtalk=xtalk, coupling=coupling, scaling=scaling,
            phi2=(phi2_ref[0, 0, k] if drive2 else None))
        (Ukr, Uki), residuals = _expm_chain(Ar, Ai, scaling)
        # Ĝ_k = V_{k+1}·U_k
        Cr, Ci = _matmul_soa(Vr, Vi, Ukr, Uki)
        Dr, Di = _expm_vjp(Cr, Ci, Ar, Ai, residuals)

        (dphi_s, dphi2_s, dom_s, dtau_s, dd1_s, dd2_s,
         deps_s) = _param_grads_from_D(
            Dr, Di, Kr, Ki, scal, eps, zero, xtalk=xtalk, scaling=scaling)

        dphi_ref[0, 0, k] += jnp.sum(dphi_s)
        dom_ref[0, 0, k] += jnp.sum(dom_s)
        dtau_ref[0, 0, k] += jnp.sum(dtau_s)
        if drive2:
            dphi2_ref[0, 0, k] += jnp.sum(dphi2_s)

        # V_k = U_k^H·Ĝ_k
        Uhr, Uhi = _conjT(Ukr, Uki)
        Vr2, Vi2 = _matmul_soa(Uhr, Uhi, Cr, Ci)
        return (_flatten2(Vr2, Vi2)
                + (dd1 + dd1_s, dd2 + dd2_s, de + deps_s))

    carry = _flatten2(Vr, Vi) + (zero, zero, zero)
    carry = jax.lax.fori_loop(0, L, bwd_body, carry)
    dd1_ref[0] = carry[32]
    dd2_ref[0] = carry[33]
    deps_ref[0] = carry[34]


@functools.partial(jax.jit,
                   static_argnames=("xtalk", "coupling", "scaling",
                                    "tile_rows", "drive2"))
def su4_objective_vjp_from_product(pulses, target_re, target_im, delta1,
                                   delta2, epsilon, gbar, prod, *, xtalk=0.1,
                                   coupling=0.5, scaling=4,
                                   tile_rows=_DEF_ROWS, drive2=False):
    """VJP of the fused two-qubit objective, seeded with the saved product.

    ``prod`` is the second output of
    :func:`..propagate_su4_pallas.mean_fidelity_su4_pallas_with_product`
    (padded SoA layout ``(B, 32, rows, LANES)``).  Returns the same tuple as
    :func:`su4_objective_vjp_pallas` but skips the forward-chain rebuild.
    """
    B, L, Pn = pulses.shape
    cols = _split_pulses(pulses, drive2)
    delta1, delta2, epsilon, M_orig = _pad_mc(delta1, delta2, epsilon)
    M = delta1.shape[1]
    rows, tr, ntiles = _mc_grid(M, tile_rows)
    if prod.shape != (B, 32, rows, LANES):
        raise ValueError(
            f"prod shape {prod.shape} != expected {(B, 32, rows, LANES)}; "
            f"pass the product emitted by "
            f"mean_fidelity_su4_pallas_with_product on the SAME disorder")
    d1 = delta1.reshape(B, rows, LANES)
    d2 = delta2.reshape(B, rows, LANES)
    ep = epsilon.reshape(B, rows, LANES)
    t_r = target_re.reshape(B, 1, 16)
    t_i = target_im.reshape(B, 1, 16)
    gb = gbar.reshape(B, 1, 1)

    cols = tuple(c[:, None, :] for c in cols)  # (B, 1, L)
    # per-target (1, 1, ·) SMEM streaming — see the SU(2) twin for the rule
    smem_bl = lambda: pl.BlockSpec((1, 1, L), lambda b, j: (b, 0, 0),
                                   memory_space=pltpu.SMEM)
    smem_bt = lambda: pl.BlockSpec((1, 1, 16), lambda b, j: (b, 0, 0),
                                   memory_space=pltpu.SMEM)
    smem_b1 = lambda: pl.BlockSpec((1, 1, 1), lambda b, j: (b, 0, 0),
                                   memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec((1, tr, LANES), lambda b, j: (b, j, 0),
                                memory_space=pltpu.VMEM)
    prod_spec = pl.BlockSpec((1, 32, tr, LANES), lambda b, j: (b, 0, j, 0),
                             memory_space=pltpu.VMEM)
    n_dp = 4 if drive2 else 3        # dphi[, dphi2], dom, dtau tables
    outs = pl.pallas_call(
        functools.partial(_bwd_prod_kernel, L=L, xtalk=xtalk,
                          coupling=coupling, scaling=scaling,
                          M_valid=(M_orig if M_orig != M else None),
                          inv_M=1.0 / M_orig, tile_rows=tr, drive2=drive2),
        grid=(B, ntiles),
        in_specs=[*([smem_bl()] * len(cols)), smem_bt(), smem_bt(),
                  smem_b1(), vmem(), vmem(), vmem(), prod_spec],
        out_specs=(*([smem_bl()] * n_dp), vmem(), vmem(), vmem()),
        out_shape=(
            *([jax.ShapeDtypeStruct((B, 1, L), jnp.float32)] * n_dp),
            jax.ShapeDtypeStruct((B, rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, rows, LANES), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * M * L * 4700 * 3, transcendentals=B * L * 4,
            bytes_accessed=B * (L * 24 + M * 24 + M * 128 + 132),
        ),
        interpret=_interpret(),
    )(*cols, t_r, t_i, gb, d1, d2, ep, prod)
    *dp, dd1, dd2, de = outs
    dpulses = _stack_dpulses([d[:, 0, :] for d in dp], Pn, drive2)
    return (dpulses, dd1.reshape(B, M)[:, :M_orig],
            dd2.reshape(B, M)[:, :M_orig],
            de.reshape(B, M)[:, :M_orig])


@functools.partial(jax.jit,
                   static_argnames=("xtalk", "coupling", "scaling",
                                    "tile_rows", "drive2"))
def su4_objective_vjp_pallas(pulses, target_re, target_im, delta1, delta2,
                             epsilon, gbar, *, xtalk=0.1, coupling=0.5,
                             scaling=4, tile_rows=_DEF_ROWS, drive2=False):
    """VJP of the fused two-qubit objective.

    ``gbar (B,)`` is the cotangent of the per-target mean fidelities;
    returns ``(dpulses (B, L, P), ddelta1 (B, M), ddelta2 (B, M),
    deps (B, M))``.
    """
    B, L, Pn = pulses.shape
    cols = _split_pulses(pulses, drive2)
    delta1, delta2, epsilon, M_orig = _pad_mc(delta1, delta2, epsilon)
    M = delta1.shape[1]
    rows, tr, ntiles = _mc_grid(M, tile_rows)
    d1 = delta1.reshape(B, rows, LANES)
    d2 = delta2.reshape(B, rows, LANES)
    ep = epsilon.reshape(B, rows, LANES)
    t_r = target_re.reshape(B, 1, 16)
    t_i = target_im.reshape(B, 1, 16)
    gb = gbar.reshape(B, 1, 1)

    cols = tuple(c[:, None, :] for c in cols)  # (B, 1, L)
    # per-target (1, 1, ·) SMEM streaming — see the SU(2) twin for the rule
    smem_bl = lambda: pl.BlockSpec((1, 1, L), lambda b, j: (b, 0, 0),
                                   memory_space=pltpu.SMEM)
    smem_bt = lambda: pl.BlockSpec((1, 1, 16), lambda b, j: (b, 0, 0),
                                   memory_space=pltpu.SMEM)
    smem_b1 = lambda: pl.BlockSpec((1, 1, 1), lambda b, j: (b, 0, 0),
                                   memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec((1, tr, LANES), lambda b, j: (b, j, 0),
                                memory_space=pltpu.VMEM)
    n_dp = 4 if drive2 else 3
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, L=L, xtalk=xtalk, coupling=coupling,
                          scaling=scaling,
                          M_valid=(M_orig if M_orig != M else None),
                          inv_M=1.0 / M_orig, tile_rows=tr, drive2=drive2),
        grid=(B, ntiles),
        in_specs=[*([smem_bl()] * len(cols)), smem_bt(), smem_bt(),
                  smem_b1(), vmem(), vmem(), vmem()],
        out_specs=(*([smem_bl()] * n_dp), vmem(), vmem(), vmem()),
        out_shape=(
            *([jax.ShapeDtypeStruct((B, 1, L), jnp.float32)] * n_dp),
            jax.ShapeDtypeStruct((B, rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, rows, LANES), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * M * L * 4700 * 4, transcendentals=B * L * 4,
            bytes_accessed=B * (L * 24 + M * 24 + 132),
        ),
        interpret=_interpret(),
    )(*cols, t_r, t_i, gb, d1, d2, ep)
    *dp, dd1, dd2, de = outs
    dpulses = _stack_dpulses([d[:, 0, :] for d in dp], Pn, drive2)
    return (dpulses, dd1.reshape(B, M)[:, :M_orig],
            dd2.reshape(B, M)[:, :M_orig],
            de.reshape(B, M)[:, :M_orig])


def _stack_dpulses(dp, Pn, drive2):
    """Assemble the (B, L, Pn) pulse cotangent from the kernel's tables.

    dp = [dphi, (dphi2,) dom, dtau]; the 2-parameter space drops dom."""
    if drive2:
        return jnp.stack(dp, axis=-1)            # (φ₁, φ₂, Ω, τ)
    dphi, dom, dtau = dp
    if Pn == 3:
        return jnp.stack([dphi, dom, dtau], axis=-1)
    return jnp.stack([dphi, dtau], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def mean_fidelity_su4_trainable(pulses, target_re, target_im, delta1,
                                delta2, epsilon, xtalk=0.1, coupling=0.5,
                                scaling=4, drive2=False):
    """Differentiable fused two-qubit objective: ``(B,) E_M[F]``.

    Forward = the fused SoA Pallas kernel (also emitting the per-sample
    product to HBM); backward = the product-seeded fused reverse-sweep
    kernel above (the product is the only stored residual beyond the
    inputs — no per-segment storage).  Use as the training objective for
    the two-qubit workload (``--backend pallas``)."""
    return mean_fidelity_su4_pallas(pulses, target_re, target_im, delta1,
                                    delta2, epsilon, xtalk=xtalk,
                                    coupling=coupling, scaling=scaling,
                                    drive2=drive2)


def _fwd(pulses, target_re, target_im, delta1, delta2, epsilon, xtalk,
         coupling, scaling, drive2):
    out, prod = mean_fidelity_su4_pallas_with_product(
        pulses, target_re, target_im, delta1, delta2, epsilon, xtalk=xtalk,
        coupling=coupling, scaling=scaling, drive2=drive2)
    return out, (pulses, target_re, target_im, delta1, delta2, epsilon, prod)


def _bwd(xtalk, coupling, scaling, drive2, res, gbar):
    pulses, target_re, target_im, delta1, delta2, epsilon, prod = res
    dpulses, dd1, dd2, de = su4_objective_vjp_from_product(
        pulses, target_re, target_im, delta1, delta2, epsilon, gbar, prod,
        xtalk=xtalk, coupling=coupling, scaling=scaling, drive2=drive2)
    # target cotangents are not needed by any training path (targets are
    # data); returning zeros keeps the signature total.
    return (dpulses, jnp.zeros_like(target_re), jnp.zeros_like(target_im),
            dd1, dd2, de)


mean_fidelity_su4_trainable.defvjp(_fwd, _bwd)
