r"""Fused Pallas backward kernel for the Monte-Carlo propagator.

Computes the VJP of ``propagate_mc`` with O(1) residual memory: instead of
storing per-segment products (the XLA scan VJP stores all L carries), the
backward sweep reconstructs the right-prefix ``R_k = q_{k-1} ⊗ ⋯ ⊗ q_1`` by
*inverse* Hamilton products from the full product (unit quaternions:
``q⁻¹ = conj(q)``) and maintains the conjugated left-suffix on the fly.

Math: with ``Q = L_k ⊗ q_k ⊗ R_k`` and output cotangent ``g``, the cotangent
of segment k is ``A_k = conj(L_k) ⊗ g ⊗ conj(R_k)`` (the adjoint of the
linear map ``q ↦ L ⊗ q ⊗ R`` under the Euclidean inner product on ℝ⁴ is
``v ↦ conj(L) ⊗ v ⊗ conj(R)`` for unit L, R).  Chaining through the
closed-form segment quaternion gives dφ/dτ (summed over the sample tile into
SMEM accumulators) and dδ/dε (per sample).

Loops run as ``fori_loop`` with dynamic SMEM scalar indexing, so L=400
compiles without a 2·L static unroll.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .propagate_pallas import (
    DEFAULT_SINCOS,
    LANES,
    _interpret,
    _mc_grid,
    _pad_mc,
    _sincos_poly,
    _sincos_poly_ns,
)


def _sincos(x, sincos):
    if sincos in ("poly", "poly_fast"):
        return _sincos_poly(x, fast=(sincos == "poly_fast"))
    if sincos == "poly_fast_ns":
        return _sincos_poly_ns(x, fast=True)
    if sincos == "poly_ns":
        # sign-free HALF-ANGLE variant: valid only when the whole
        # fwd-value + bwd chain uses it consistently (the fidelity seed is
        # recomputed from the same ±q parametrization, so every parity
        # sign cancels — see _sincos_poly_ns)
        return _sincos_poly_ns(x)
    return jnp.sin(x), jnp.cos(x)

__all__ = ["propagate_mc_vjp_pallas"]


def _hprod(a, b):
    """Hamilton product on component 4-tuples."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by + ay * bw + az * bx - ax * bz,
        aw * bz + az * bw + ax * by - ay * bx,
    )


def _conj(a):
    aw, ax, ay, az = a
    return (aw, -ax, -ay, -az)


def _bwd_kernel(*refs, L, P, sincos="native"):
    """Fused VJP sweep over the P-parameter pulse space.

    ``P=2`` ``(φ, τ)`` refs ``(phi, tau, δ, ε, g → dphi, dtau, dδ, dε)``;
    ``P=3`` ``(φ, Ω, τ)`` adds the Ω table and its cotangent; ``P=4``
    ``(φ, Ω, Δ, τ)`` adds the per-segment detuning Δ, whose cotangent is
    the σz-axis derivative summed over the sample tile (Δ and the disorder
    δ enter the axis identically as Δ + δ, so they share the chain rule —
    ``segment_quat_det`` in core/su2.py is the XLA twin).

    Ω is clamped at 0 like the XLA path (``segment_quat_amp``); its cotangent
    is gated on ``Ω_raw > 0`` (XLA's ``maximum`` splits the tie at exactly 0 —
    a measure-zero difference)."""
    amp = P >= 3
    has_det = P == 4
    if has_det:
        (phi_ref, om_ref, det_ref, tau_ref, delta_ref, eps_ref, g_ref,
         dphi_ref, dom_ref, ddet_ref, dtau_ref, ddelta_ref, deps_ref) = refs
    elif amp:
        (phi_ref, om_ref, tau_ref, delta_ref, eps_ref, g_ref,
         dphi_ref, dom_ref, dtau_ref, ddelta_ref, deps_ref) = refs
    else:
        (phi_ref, tau_ref, delta_ref, eps_ref, g_ref,
         dphi_ref, dtau_ref, ddelta_ref, deps_ref) = refs
    j = pl.program_id(1)
    delta = delta_ref[0]
    eps = eps_ref[0]
    if not amp:
        # P=2 axis norm √(1+δ²) is segment-independent — hoist it
        anorm2 = 1.0 + delta * delta
        anorm = jnp.sqrt(anorm2)
        inv_anorm = 1.0 / anorm

    @pl.when(j == 0)
    def _():
        # SMEM accepts only scalar stores: zero this target's rows one by one
        def zero_k(k, _):
            dphi_ref[0, 0, k] = 0.0
            dtau_ref[0, 0, k] = 0.0
            if amp:
                dom_ref[0, 0, k] = 0.0
            if has_det:
                ddet_ref[0, 0, k] = 0.0
            return 0
        jax.lax.fori_loop(0, L, zero_k, 0)

    zero = jnp.zeros_like(delta)
    one = jnp.ones_like(delta)

    def seg(k):
        """Segment quaternion + the intermediates the chain rule reuses."""
        phi = phi_ref[0, 0, k]
        tau = tau_ref[0, 0, k]
        # φ keeps its parity sign: an axis flip is NOT a global
        # quaternion sign (only the half-angle may go sign-free)
        sphi, cphi = _sincos(phi, sincos[:-3] if sincos.endswith("_ns")
                             else sincos)
        if amp:
            om_raw = om_ref[0, 0, k]
            om = jnp.maximum(om_raw, 0.0)
            zax = det_ref[0, 0, k] + delta if has_det else delta
            a2 = jnp.maximum(om * om + zax * zax, 1e-12)
            inv = jax.lax.rsqrt(a2)
            n = a2 * inv
        else:
            om_raw = om = 1.0
            zax = delta
            n, inv = anorm, inv_anorm
        half = 0.5 * tau * (1.0 + eps) * n
        sn, c = _sincos(half, sincos)   # sin(half), cos(half)
        s = sn * inv                    # sin(half)/‖a‖
        q = (c, s * (om * cphi), s * (om * sphi), s * zax)
        return q, (tau, om_raw, om, zax, n, inv, sn, c, s, sphi, cphi)

    # ---- forward: full product P = q_L ⊗ ⋯ ⊗ q_1 -------------------------
    def fwd_body(k, P):
        q, _ = seg(k)
        return _hprod(q, P)

    unroll = L <= 64  # static unroll for short sequences; fori for L=400
    P = (one, zero, zero, zero)
    if unroll:
        for k in range(L):
            P = fwd_body(k, P)
    else:
        P = jax.lax.fori_loop(0, L, fwd_body, P)

    g = (g_ref[0, 0], g_ref[0, 1], g_ref[0, 2], g_ref[0, 3])

    # ---- backward sweep ---------------------------------------------------
    def bwd_body(i, carry):
        P, cL, dd, de = carry
        k = L - 1 - i
        q, (tau, om_raw, om, zax, n, inv, sn, c, s, sphi, cphi) = seg(k)

        # R_k = P_{k-1} = q_k^{-1} ⊗ P   (unit quaternion inverse = conj)
        R = _hprod(_conj(q), P)
        # A = conj(L_k) ⊗ g ⊗ conj(R_k)
        A = _hprod(cL, _hprod(g, _conj(R)))
        Aw, Ax, Ay, Az = A

        # chain rule through the closed-form segment quaternion;
        # axy = ⟨A_xy, (cφ, sφ)⟩, proj = ⟨A_vec, axis⟩
        axy = Ax * cphi + Ay * sphi
        proj = om * axy + Az * zax
        h_tau = 0.5 * (1.0 + eps) * n
        h_eps = 0.5 * tau * n
        h_del = 0.5 * tau * (1.0 + eps) * zax * inv
        # ∂q/∂φ = (0, −s·Ω·sφ, s·Ω·cφ, 0)
        dphi_s = (s * om) * (Ay * cphi - Ax * sphi)
        # ∂q/∂τ = (−sn·h_τ, c·h_τ/n·axis)
        ds_tau = c * h_tau * inv
        dtau_s = -sn * h_tau * Aw + ds_tau * proj
        # ∂q/∂ε — same form with h_ε
        ds_eps = c * h_eps * inv
        deps_s = -sn * h_eps * Aw + ds_eps * proj
        # ∂q/∂z-axis (z = Δ + δ): ds = c·h_z/n − s·z/n², plus the direct
        # s term on the z component — shared by the δ disorder and (P=4)
        # the detuning control, which enter the axis identically
        ds_del = c * h_del * inv - s * zax * (inv * inv)
        ddel_s = -sn * h_del * Aw + ds_del * proj + s * Az

        # per-(b, k) pulse grads: reduce over the sample tile into SMEM
        dphi_ref[0, 0, k] += jnp.sum(dphi_s)
        dtau_ref[0, 0, k] += jnp.sum(dtau_s)
        if amp:
            # ∂q/∂Ω: dh/dΩ = ½τ(1+ε)·Ω/n; ds/dΩ = c·h_Ω/n − s·Ω/n²; plus the
            # direct s·(cφ, sφ) term on (x, y); gated on the Ω ≥ 0 clamp
            h_om = 0.5 * tau * (1.0 + eps) * om * inv
            ds_om = c * h_om * inv - s * om * (inv * inv)
            dom_s = -sn * h_om * Aw + ds_om * proj + s * axy
            dom_s = jnp.where(om_raw > 0.0, dom_s, 0.0)
            dom_ref[0, 0, k] += jnp.sum(dom_s)
        if has_det:
            ddet_ref[0, 0, k] += jnp.sum(ddel_s)

        # update the conjugated left-suffix: conj(L_{k-1}) = conj(q_k) ⊗ cL
        cL_next = _hprod(_conj(q), cL)
        return R, cL_next, dd + ddel_s, de + deps_s

    carry = (P, (one, zero, zero, zero), zero, zero)
    if unroll:
        for i in range(L):
            carry = bwd_body(i, carry)
    else:
        carry = jax.lax.fori_loop(0, L, bwd_body, carry)
    _, _, dd, de = carry
    ddelta_ref[0] = dd
    deps_ref[0] = de


@functools.partial(jax.jit, static_argnames=("tile_rows", "sincos"))
def propagate_mc_vjp_pallas(pulses: jax.Array, delta: jax.Array,
                            eps: jax.Array, g: jax.Array,
                            tile_rows: int = 64,
                            sincos: str = None) -> Tuple[jax.Array, ...]:
    """VJP of the MC propagator: cotangent ``g (B, M, 4)`` →
    ``(dpulses (B, L, P), ddelta (B, M), deps (B, M))``, P ∈ {2, 3, 4}.

    One fused kernel: forward product rebuild + reverse sweep, no stored
    per-segment residuals.

    M need not be a lane multiple: disorder and cotangents are zero-padded
    (a zero cotangent contributes exactly zero to every gradient), and the
    padded per-sample gradients are sliced off.
    """
    from .propagate_pallas import _pulse_columns

    sincos = sincos if sincos is not None else DEFAULT_SINCOS
    B, L, P = pulses.shape
    cols = _pulse_columns(pulses)
    delta, eps, g, M_orig = _pad_mc(delta, eps, g)
    M = delta.shape[1]
    rows, tr, ntiles = _mc_grid(B, M, tile_rows)
    delta_r = delta.reshape(B, rows, LANES)
    eps_r = eps.reshape(B, rows, LANES)
    g_r = jnp.moveaxis(g, -1, 1).reshape(B, 4, rows, LANES)

    # per-target (1, L) SMEM streaming: inputs AND gradient accumulators
    # stay resident across the j tiles of each target (j is the innermost
    # grid axis), so the += reduction and the j==0 zero-init are exact while
    # SMEM use is O(L·P) regardless of B (a full (B, L) residency capped
    # B·L·P at the 1 MB SMEM budget)
    cols = tuple(c[:, None, :] for c in cols)  # (B, 1, L)
    smem_spec = pl.BlockSpec((1, 1, L), lambda b, j: (b, 0, 0),
                             memory_space=pltpu.SMEM)
    *dcols, ddelta, deps = pl.pallas_call(
        functools.partial(_bwd_kernel, L=L, P=P, sincos=sincos),
        grid=(B, ntiles),
        in_specs=[
            *([smem_spec] * P),
            pl.BlockSpec((1, tr, LANES), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, LANES), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, tr, LANES), lambda b, j: (b, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            *([smem_spec] * P),
            pl.BlockSpec((1, tr, LANES), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, LANES), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            *([jax.ShapeDtypeStruct((B, 1, L), jnp.float32)] * P),
            jax.ShapeDtypeStruct((B, rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, rows, LANES), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * M * L * 150, transcendentals=B * M * L * 8,
            bytes_accessed=B * (L * 8 * P + M * 8 + M * 16 + M * 16),
        ),
        interpret=_interpret(),
    )(*cols, delta_r, eps_r, g_r)

    dpulses = jnp.stack([d[:, 0, :] for d in dcols], axis=-1)
    return (dpulses, ddelta.reshape(B, M)[:, :M_orig],
            deps.reshape(B, M)[:, :M_orig])
