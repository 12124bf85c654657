r"""Fused Pallas (Mosaic) propagator kernel — the framework's hot op.

One kernel propagates a tile of Monte-Carlo disorder samples through all L
segments of a composite pulse sequence entirely in VMEM/registers:

* per-segment closed-form SU(2) exponential as a real quaternion
  (no complex dtype, no ``matrix_exp`` — ~20 VPU FLOPs per segment),
* left-to-right composition by Hamilton product with the running product
  held in registers across a statically unrolled segment loop,
* optional on-chip fidelity + mean reduction so only ``O(B)`` scalars leave
  the chip instead of ``O(B·M)`` quaternions.

Layout: the fused Monte-Carlo axis is reshaped to ``(rows, 128)`` so samples
map onto VPU lanes; tiles of 128 rows are processed per grid step (swept).
The current target's ``(1, L)`` pulse rows stream into SMEM per grid step
(block index map over a unit middle axis) — one scalar broadcast per segment
against the sample tile, and SMEM use is ``O(L·P)`` regardless of the target
batch (a full ``(B, L)`` residency capped ``B·L·P`` at the 1 MB SMEM budget).

The backward pass is ALSO a fused Pallas kernel
(:mod:`.propagate_pallas_bwd`): a reverse sweep that reconstructs prefix
products by inverse Hamilton products — zero stored residuals (the XLA scan
VJP would store all L carries).

Reference being replaced: ``batched_unitary_generator``
(train/unitary_single_qubit_gate/universal_single_qubit_SCORE.py:77-145).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import propagate as xla_prop
from ..core import su2

__all__ = ["propagate_mc_pallas", "mean_fidelity_pallas"]

LANES = 128
# rows per tile.  Round-2 sweep (serial schedule): 128 beat 64/256/512 by
# 5-20%.  Round-3 re-sweep with the paired schedule: 64 wins decisively
# (2.51e9 → 2.68e9 with poly, → 3.33e9 with poly_fast; see
# benchmarks/su2_fwd_levers.py) — the shorter tile halves live-register
# pressure, letting Mosaic overlap the two independent segment builds.
_DEF_ROWS = 64

import os as _os

# segment sin/cos implementation: "poly" (fused reduced-range deg-9/8
# minimax, the default — per-segment error below the f32 rounding floor, so
# accumulated E[F] error stays ≤6e-7 even at L=400), "poly_fast" (deg-7/6,
# +24% at tile 64: 2.68e9 → 3.33e9 props/s on v5e; per-segment ~8e-6,
# accumulating to E[F] error 1.2e-4 @ L=100 / 3.8e-4 @ L=400 at σ_δ=2 —
# inside the 1e-3 parity budget and below M=10k MC noise, opt in when
# throughput matters more than the last decade of determinism), or
# "native" (libm, 1.3e9).  Overridable per-process via UQOC_SINCOS.
DEFAULT_SINCOS = _os.environ.get("UQOC_SINCOS", "poly")

# segment composition schedule: "paired" (carry <- (q_{k+1} ∘ q_k) ∘ carry —
# halves the serial carry-chain length at the same op count; the default
# after the round-3 sweep: +12% at tile 128, +11% at tile 64, error-neutral
# — f32 association-order rounding only) or "serial" (carry <- q_k ∘ carry).
# See benchmarks/su2_fwd_levers.py for the measured grid.
DEFAULT_SCHEDULE = _os.environ.get("UQOC_SCHEDULE", "paired")


def _interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU (CPU backend) so the
    pallas backend stays usable everywhere (tests, laptops)."""
    return jax.default_backend() == "cpu"


_INV_PI = 0.3183098861837907   # 1/pi
_PI_HI = 3.140625            # Cody–Waite split of pi (exact in f32)
_PI_LO = 9.67653589793e-4


# Minimax (equioscillating least-squares on Chebyshev nodes) coefficients on
# [-π/2, π/2], leading terms pinned to 1·r / 1: sin deg 9 (max err 4.9e-9),
# cos deg 8 (5.5e-8) — both below the f32 rounding floor of the evaluation
# (~2e-7), one r² term shorter than the round-2 Taylor deg-11/10 pair.
_S1, _S2, _S3, _S4 = (-1.66666567e-01, 8.33301032e-03,
                      -1.98062014e-04, 2.59927677e-06)
_C1, _C2, _C3, _C4 = (-4.99999303e-01, 4.16639475e-02,
                      -1.38556582e-03, 2.31890375e-05)

# One-term-shorter pair for the throughput-lever experiment
# (benchmarks/su2_fwd_levers.py): sin deg 7 (max err 1.35e-6), cos deg 6
# (8.2e-6) — combined error still under the 1e-5 vs-libm contract, two fewer
# FMAs per segment.  Selected by sincos="poly_fast" / UQOC_SINCOS=poly_fast.
_F1, _F2, _F3 = (-1.66659260e-01, 8.31521997e-03, -1.85700483e-04)
_G1, _G2, _G3 = (-4.99933990e-01, 4.15051200e-02, -1.27522438e-03)


def _sincos_core(x, fast=False):
    """Cody–Waite reduction + shared-r² minimax polys.  Returns
    (sin r, cos r, k): the true values are ``(-1)^k · (sin r, cos r)``."""
    k = jnp.round(x * _INV_PI)
    r = (x - k * _PI_HI) - k * _PI_LO          # r ∈ [-π/2, π/2]
    r2 = r * r
    if fast:
        s = r * (1.0 + r2 * (_F1 + r2 * (_F2 + r2 * _F3)))
        c = 1.0 + r2 * (_G1 + r2 * (_G2 + r2 * _G3))
    else:
        s = r * (1.0 + r2 * (_S1 + r2 * (_S2 + r2 * (_S3 + r2 * _S4))))
        c = 1.0 + r2 * (_C1 + r2 * (_C2 + r2 * (_C3 + r2 * _C4)))
    return s, c, k


def _sincos_poly(x, fast=False):
    """Fused sin+cos: one-step Cody–Waite reduction to |r| ≤ π/2 + shared-x²
    minimax polys (sin deg 9, cos deg 8) — ~17 VPU ops for BOTH values vs
    two full-range libm transcendentals.  Max abs error < 1e-6 on all of ℝ
    reachable here (|x| ≲ 10³; the segment angle is |τ·½(1+ε)√(1+δ²)|).
    """
    s, c, k = _sincos_core(x, fast)
    # parity: sin/cos(x) = (-1)^k · sin/cos(r)
    sign = 1.0 - 2.0 * (k - 2.0 * jnp.floor(k * 0.5))
    return s * sign, c * sign


def _sincos_poly_ns(x, fast=False):
    """Sign-free half-angle sincos for the FIDELITY/VJP kernels only.

    Returns ``±(sin x, cos x)`` with a consistent but unresolved parity
    sign: the segment quaternion built from it is ``±q_k``, so the final
    product is ``±(Π q_k)`` — and entanglement fidelity
    ``F = (4⟨q, q_t⟩² + 2)/6`` is EVEN in the quaternion sign, so F and
    (since the dropped sign is locally constant in the parameters) all its
    derivatives are exact.  Saves the ~6 parity ops per segment.  NOT valid
    for :func:`propagate_mc_pallas` (quaternions leave the kernel) or for
    the drive-phase φ (an axis flip is not a global quaternion sign)."""
    s, c, _ = _sincos_core(x, fast)
    return s, c


def _hamilton(p, q):
    """(pw,px,py,pz) ∘ (qw,qx,qy,qz) — 16 FMA-class VPU ops."""
    pw, px, py, pz = p
    qw, qx, qy, qz = q
    return (pw * qw - px * qx - py * qy - pz * qz,
            pw * qx + px * qw + py * qz - pz * qy,
            pw * qy + py * qw + pz * qx - px * qz,
            pw * qz + pz * qw + px * qy - py * qx)


def _segment_loop(pulse_refs, b, delta, eps, L, sincos="native",
                  schedule="serial"):
    """Shared kernel body: compose L segments over a (rows, 128) sample tile.

    ``pulse_refs`` holds the CURRENT target's (1, L) pulse rows in SMEM,
    streamed per grid step by the block index map (so SMEM use is L·P
    words regardless of B — a full (B, L) residency capped B·L·P at the
    1 MB SMEM budget and broke L=400 batch-200 training) —
    ``(phi, tau)``, ``(phi, omega, tau)``, or ``(phi, omega, det, tau)``
    (the general pulse-space contract the reference declares at
    universal_model.py:31; test.py:16-18 declares the 4-parameter form).
    ``b`` is the row index INSIDE the block (always 0 with streamed
    blocks).  delta/eps are (rows, 128) sample arrays.  Returns the 4
    quaternion components.

    ``sincos``: "native" (libm sin/cos), "poly" (fused reduced-range minimax
    — see :func:`_sincos_poly`), "poly_fast" (one r² term shorter, ~1e-5
    max err), or the ``*_ns`` sign-free variants (fidelity/VJP path only).
    ``schedule``: "serial" folds each segment into the carry (L dependent
    Hamilton products); "paired" builds q_{k+1}∘q_k first and folds pairs
    (same op count, carry-chain length L/2 — an ILP lever; measured
    equivalent on v5e where the (rows, 128) tile already fills the VPU
    pipeline, see benchmarks/su2_fwd_levers.py).
    """
    P = len(pulse_refs)
    amp = P >= 3
    det = P == 4
    if det:
        phi_ref, om_ref, det_ref, tau_ref = pulse_refs
        scale = 0.5 * (1.0 + eps)
    elif amp:
        phi_ref, om_ref, tau_ref = pulse_refs
        scale = 0.5 * (1.0 + eps)  # per-sample; axis norm varies per segment
    else:
        phi_ref, tau_ref = pulse_refs
        # P=2: the axis (cosφ, sinφ, δ) has per-sample norm √(1+δ²) that is
        # CONSTANT across segments — hoist it out of the loop
        anorm2 = 1.0 + delta * delta
        anorm = jnp.sqrt(anorm2)
        inv_anorm = 1.0 / anorm
        scale = 0.5 * (1.0 + eps) * anorm  # tau multiplier per sample

    fast = sincos.startswith("poly_fast")

    def segment(k):
        nonlocal inv_anorm
        phi = pulse_refs[0][0, 0, k]
        tau = pulse_refs[-1][0, 0, k]
        zax = delta
        if amp:
            om = jnp.maximum(om_ref[0, 0, k], 0.0)
            if det:
                zax = det_ref[0, 0, k] + delta  # controllable detuning + disorder
            # axis (Ω·cosφ, Ω·sinφ, Δ+δ): norm depends on the segment
            anorm2 = jnp.maximum(om * om + zax * zax, 1e-12)
            inv_anorm = jax.lax.rsqrt(anorm2)
            half = tau * scale * anorm2 * inv_anorm  # τ·½(1+ε)·‖a‖
        else:
            om = 1.0
            half = tau * scale
        if sincos.endswith("_ns"):   # fidelity/VJP path: sign-free (F even)
            sh, w = _sincos_poly_ns(half, fast)
            s = sh * inv_anorm
        elif sincos.startswith("poly"):
            sh, w = _sincos_poly(half, fast)
            s = sh * inv_anorm
        else:
            w = jnp.cos(half)
            s = jnp.sin(half) * inv_anorm
        x = s * (om * jnp.cos(phi))
        y = s * (om * jnp.sin(phi))
        z = s * zax
        return w, x, y, z

    q = (jnp.ones_like(delta), jnp.zeros_like(delta),
         jnp.zeros_like(delta), jnp.zeros_like(delta))

    if schedule == "paired":
        for k in range(0, L - 1, 2):  # carry <- (q_{k+1} ∘ q_k) ∘ carry
            q = _hamilton(_hamilton(segment(k + 1), segment(k)), q)
        if L % 2:
            q = _hamilton(segment(L - 1), q)
    else:
        for k in range(L):  # static unroll: L is a compile-time constant
            q = _hamilton(segment(k), q)  # carry <- q_k ∘ carry
    return q


def _prop_kernel(*refs, L, sincos, schedule="serial"):
    *pulse_refs, delta_ref, eps_ref, out_ref = refs
    delta = delta_ref[0]
    eps = eps_ref[0]
    qw, qx, qy, qz = _segment_loop(tuple(pulse_refs), 0, delta, eps, L,
                                   sincos=sincos, schedule=schedule)
    out_ref[0, 0] = qw
    out_ref[0, 1] = qx
    out_ref[0, 2] = qy
    out_ref[0, 3] = qz


def _fid_kernel(*refs, L, M_valid, tr, sincos, schedule="serial"):
    *pulse_refs, qt_ref, delta_ref, eps_ref, sum_ref = refs
    delta = delta_ref[0]
    eps = eps_ref[0]
    qw, qx, qy, qz = _segment_loop(tuple(pulse_refs), 0, delta, eps, L,
                                   sincos=sincos, schedule=schedule)
    # entanglement fidelity from quaternion inner product:
    # F = (4<q, qt>^2 + 2) / 6  (SCORE.py:168-183 in quaternion form)
    inner = (qt_ref[0, 0, 0] * qw + qt_ref[0, 0, 1] * qx
             + qt_ref[0, 0, 2] * qy + qt_ref[0, 0, 3] * qz)
    F = (4.0 * inner * inner + 2.0) / 6.0
    j = pl.program_id(1)

    if M_valid is not None:
        # M was padded up to a lane multiple: mask padded samples out of the
        # mean (global sample index = (j·tr + row)·LANES + lane)
        row = jax.lax.broadcasted_iota(jnp.int32, F.shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, F.shape, 1)
        idx = (j * tr + row) * LANES + lane
        F = jnp.where(idx < M_valid, F, 0.0)

    @pl.when(j == 0)
    def _():
        sum_ref[0, 0, 0] = 0.0

    sum_ref[0, 0, 0] += jnp.sum(F)


def _pad_mc(*arrays):
    """Pad the trailing MC axis of each ``(B, M)``/``(B, M, k)`` array with
    zeros up to the next multiple of ``LANES``.  Returns the padded arrays and
    the original M (zero disorder is numerically safe: ‖axis‖ = 1).

    When the padded row count exceeds one native (8, 128) tile, it is
    further rounded to a multiple of 8 rows: Mosaic requires the
    second-minor block dimension to be a multiple of 8 or equal to the
    array dimension, so an odd row count (e.g. M=200k → 1563 rows) would
    otherwise force an unlowerable (…, 1, 128) block.  Padded samples are
    masked out of every kernel mean via ``M_valid``."""
    M = arrays[0].shape[1]
    Mp = -(-M // LANES) * LANES
    if Mp // LANES > 8:
        Mp = -(-Mp // (8 * LANES)) * (8 * LANES)
    if Mp == M:
        return arrays + (M,)
    out = []
    for a in arrays:
        pad = [(0, 0)] * a.ndim
        pad[1] = (0, Mp - M)
        out.append(jnp.pad(a, pad))
    return tuple(out) + (M,)


def _mc_grid(B: int, M: int, tile_rows: int) -> Tuple[int, int, int]:
    if M % LANES != 0:
        raise ValueError(f"MC sample count must be a multiple of {LANES}, "
                         f"got {M} (wrappers pad via _pad_mc)")
    rows = M // LANES
    tr = min(tile_rows, rows)
    while rows % tr != 0:
        tr //= 2
    tr = max(tr, 1)
    return rows, tr, rows // tr


def _pulse_columns(pulses):
    """Split ``(B, L, P)`` pulses into P ``(B, L)`` SMEM tables, validating
    the parameter count (P=2 ``(φ,τ)``, P=3 ``(φ,Ω,τ)``, or P=4
    ``(φ,Ω,Δ,τ)`` — the reference's full declared space, test.py:16-18)."""
    P = pulses.shape[-1]
    if P not in (2, 3, 4):
        raise ValueError(
            f"SU(2) Pallas propagator supports pulse parameter counts 2 "
            f"(phi, tau), 3 (phi, omega, tau) and 4 (phi, omega, delta, "
            f"tau); got P={P} (pulses shape {pulses.shape})")
    return tuple(pulses[..., i] for i in range(P))


@functools.partial(jax.jit,
                   static_argnames=("tile_rows", "sincos", "schedule"))
def _propagate_mc_pallas_raw(pulses, delta, eps, tile_rows=_DEF_ROWS,
                             sincos=None, schedule=None):
    """(B, L, P) pulses × (B, M) disorder → (B, M, 4) quaternions, P ∈ {2,3,4}.

    M need not be a lane multiple: the MC axis is zero-padded up to one and
    the padded rows are sliced off the result (exact)."""
    B, L, _ = pulses.shape
    sincos = sincos if sincos is not None else DEFAULT_SINCOS
    schedule = schedule if schedule is not None else DEFAULT_SCHEDULE
    cols = _pulse_columns(pulses)
    delta, eps, M_orig = _pad_mc(delta, eps)
    M = delta.shape[1]
    rows, tr, ntiles = _mc_grid(B, M, tile_rows)
    delta_r = delta.reshape(B, rows, LANES)
    eps_r = eps.reshape(B, rows, LANES)

    cols = tuple(c[:, None, :] for c in cols)  # (B, 1, L)
    smem_spec = pl.BlockSpec((1, 1, L), lambda b, j: (b, 0, 0),
                             memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_prop_kernel, L=L, sincos=sincos,
                          schedule=schedule),
        grid=(B, ntiles),
        in_specs=[
            # the current target's (1, L) pulse rows stream into SMEM per
            # grid step (j revisits the same block, so the copy happens
            # once per b) — SMEM use is L·P words regardless of B
            *([smem_spec] * len(cols)),
            pl.BlockSpec((1, tr, LANES), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, LANES), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, tr, LANES), lambda b, j: (b, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 4, rows, LANES), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * M * L * 40, transcendentals=B * M * (L * 4 + 2),
            bytes_accessed=B * (L * 8 + M * 8 + M * 16),
        ),
        interpret=_interpret(),
    )(*cols, delta_r, eps_r)
    return jnp.moveaxis(out, 1, -1).reshape(B, M, 4)[:, :M_orig]


@jax.custom_vjp
def propagate_mc_pallas(pulses: jax.Array, delta: jax.Array, eps: jax.Array) -> jax.Array:
    """Monte-Carlo–fused Pallas propagator: ``(B,L,P) × (B,M) → (B,M,4)``,
    P ∈ {2, 3, 4} (``(φ,τ)`` fixed-amplitude / ``(φ,Ω,τ)`` amplitude-
    modulated / ``(φ,Ω,Δ,τ)`` detuned).

    Forward runs the fused Mosaic kernel; backward is the fused Pallas
    reverse-sweep kernel (:func:`.propagate_pallas_bwd.propagate_mc_vjp_pallas`
    — inverse-quaternion prefix reconstruction, zero stored residuals), NOT
    autodiff through XLA — see module docstring.
    """
    return _propagate_mc_pallas_raw(pulses, delta, eps)


def _fwd(pulses, delta, eps):
    return _propagate_mc_pallas_raw(pulses, delta, eps), (pulses, delta, eps)


def _bwd(res, g):
    # fused Pallas reverse sweep — no stored per-segment residuals
    from .propagate_pallas_bwd import propagate_mc_vjp_pallas
    pulses, delta, eps = res
    return propagate_mc_vjp_pallas(pulses, delta, eps, g)


propagate_mc_pallas.defvjp(_fwd, _bwd)


@functools.partial(jax.jit,
                   static_argnames=("tile_rows", "sincos", "schedule"))
def _mean_fid_raw(pulses, q_target, delta, eps, tile_rows=_DEF_ROWS,
                  sincos=None, schedule=None):
    B, L, _ = pulses.shape
    sincos = sincos if sincos is not None else DEFAULT_SINCOS
    schedule = schedule if schedule is not None else DEFAULT_SCHEDULE
    if sincos in ("poly", "poly_fast"):
        # fidelity is even in the quaternion sign → the parity ops of the
        # half-angle sincos can be dropped (see _sincos_poly_ns)
        sincos = sincos + "_ns"
    cols = _pulse_columns(pulses)
    delta, eps, M_orig = _pad_mc(delta, eps)
    M = delta.shape[1]
    rows, tr, ntiles = _mc_grid(B, M, tile_rows)
    delta_r = delta.reshape(B, rows, LANES)
    eps_r = eps.reshape(B, rows, LANES)

    cols = tuple(c[:, None, :] for c in cols)  # (B, 1, L)
    smem_spec = pl.BlockSpec((1, 1, L), lambda b, j: (b, 0, 0),
                             memory_space=pltpu.SMEM)
    sums = pl.pallas_call(
        functools.partial(_fid_kernel, L=L,
                          M_valid=(M_orig if M_orig != M else None), tr=tr,
                          sincos=sincos, schedule=schedule),
        grid=(B, ntiles),
        in_specs=[
            *([smem_spec] * len(cols)),
            pl.BlockSpec((1, 1, 4), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tr, LANES), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, LANES), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        # the per-target scalar reduction accumulates in a streamed (1, 1)
        # SMEM block (resident across the j tiles of each target)
        out_specs=pl.BlockSpec((1, 1, 1), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * M * (L * 40 + 10), transcendentals=B * M * (L * 4 + 2),
            bytes_accessed=B * (L * 8 + M * 8 + 4),
        ),
        interpret=_interpret(),
    )(*cols, q_target[:, None, :], delta_r, eps_r)
    return sums[:, 0, 0] / M_orig


@jax.custom_vjp
def mean_fidelity_pallas(pulses: jax.Array, q_target: jax.Array,
                         delta: jax.Array, eps: jax.Array) -> jax.Array:
    """Fully fused objective: per-target mean entanglement fidelity.

    ``(B,L,P) pulses (P ∈ {2,3,4}), (B,4) target quaternions, (B,M) disorder →
    (B,) E_M[F]`` — propagation, fidelity, and the MC mean reduce on-chip;
    only B scalars are written to HBM.
    """
    return _mean_fid_raw(pulses, q_target, delta, eps)


def _xla_mean_fid(pulses, q_target, delta, eps):
    q = xla_prop.propagate_mc(pulses, delta, eps, method="scan")
    F = su2.quat_fidelity(q, q_target[:, None, :])
    return jnp.mean(F, axis=1)


def _mf_fwd(pulses, q_target, delta, eps):
    return _mean_fid_raw(pulses, q_target, delta, eps), (pulses, q_target, delta, eps)


def _mf_bwd(res, g):
    """Backward of the fused objective, itself fully fused:
    re-run the forward Pallas propagator for the per-sample quaternions,
    chain through the fidelity analytically, then the Pallas reverse-sweep
    kernel for the pulse/disorder cotangents — no XLA scan residuals."""
    from .propagate_pallas_bwd import propagate_mc_vjp_pallas
    pulses, q_target, delta, eps = res
    M = delta.shape[1]
    # Sign-free half-angle sincos throughout: q here is ±q_true per sample,
    # but inner (hence the seed g_q) flips with it and the VJP kernel below
    # rebuilds its prefix products from the SAME ±q parametrization, so
    # every parity sign cancels in the returned cotangents (d_qt is a
    # (scale·q) product — also invariant).
    ns = (DEFAULT_SINCOS + "_ns"
          if DEFAULT_SINCOS in ("poly", "poly_fast") else DEFAULT_SINCOS)
    q = _propagate_mc_pallas_raw(pulses, delta, eps, sincos=ns)  # (B, M, 4)
    inner = jnp.sum(q * q_target[:, None, :], axis=-1)      # ⟨q, qt⟩
    # F_b = mean_m (4·inner² + 2)/6  ⇒  dF_b/dq = (8/6)·inner·qt / M
    scale = (8.0 / 6.0) * inner * g[:, None] / M            # (B, M)
    g_q = scale[..., None] * q_target[:, None, :]
    d_pulses, d_delta, d_eps = propagate_mc_vjp_pallas(pulses, delta, eps,
                                                       g_q, sincos=ns)
    d_qt = jnp.sum(scale[..., None] * q, axis=1)            # (B, 4)
    return d_pulses, d_qt, d_delta, d_eps


mean_fidelity_pallas.defvjp(_mf_fwd, _mf_bwd)
