r"""MXU spike: can the SU(4) propagator's FLOPs ride the systolic array?

VERDICT r3 item 7: the SoA forward kernel is at ~VPU f32 peak by its own
accounting while the MXU sits idle.  This script measures the two candidate
matmul formulations of the segment-expm + L-product chain against the SoA
baseline (`core/su4.propagate_su4`, layout="soa") on real hardware:

1. ``block8``  — each 4x4 complex unitary as the 8x8 real block
   [[Ur, -Ui], [Ui, Ur]]; segment expm (Taylor+squaring) and the running
   product become batched (M, 8, 8) @ (M, 8, 8) ``jnp.matmul`` calls,
   which XLA *may* map onto the MXU.  The catch: an 8x8 operand uses
   8/128 sublanes x 8/128 lanes of a tile per batch element, so the
   theoretical ceiling is ~0.4% MXU utilization unless XLA's batched-GEMM
   lowering packs batch elements into the tile.

2. ``structmm`` — squarings via the su(4) *structure tensor*: in the
   16-entry basis, (U @ U)[e] = sum_{ab} S[e, a, b] U[a] U[b] with S fixed,
   so one squaring = (a) form the 256 pairwise entry products on the VPU,
   (b) contract with the fixed (2*16, 2*256) real matrix on the MXU
   (K=512 after re/im interleave - a real MXU-shaped contraction with a
   *fixed* left operand).  This moves all the adds to the MXU but keeps
   every multiply on the VPU, so it can only win if adds (not FMAs) were
   the bottleneck - measured here to close the question with numbers.

Run on TPU: ``python benchmarks/su4_mxu_spike.py``.  Appends one
markdown row per variant; the decision rule from the verdict is
"keep if >1.5x forward, else record the negative result".

Reference role: north-star throughput metric (BASELINE.json); the
reference's own propagator is torch.linalg.matrix_exp + batched matmul
(train/two_qubit is advertised at README.md:87 but ships no code).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from universal_quantum_optimal_control_tpu.core import su4  # noqa: E402

P = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Variant 1: 8x8 real block, batched matmul
# ---------------------------------------------------------------------------

def _block8(Ur, Ui):
    """(..., 4, 4) re/im -> (..., 8, 8) real block [[Ur, -Ui], [Ui, Ur]]."""
    top = jnp.concatenate([Ur, -Ui], axis=-1)
    bot = jnp.concatenate([Ui, Ur], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def propagate_block8(pulses, delta1, delta2, epsilon, system):
    """Forward propagator, everything as batched (M, 8, 8) real matmuls.

    pulses: (L, P) single pulse table; disorder (M,) each; returns the
    (M, 8, 8) real-block product (left-multiply composition like the
    reference's U_out = U_L ... U_1)."""
    M = delta1.shape[0]
    phi, tau = pulses[:, 0], pulses[:, -1]
    omega = pulses[:, 2] if pulses.shape[1] >= 4 else None
    phi2 = pulses[:, 1] if pulses.shape[1] >= 4 else None

    def seg(k):
        ph = jnp.broadcast_to(phi[k], (M,))
        Hr16, Hi16 = su4._h16(ph, delta1, delta2, epsilon, system,
                              omega=None if omega is None
                              else jnp.broadcast_to(omega[k], (M,)),
                              phi2=None if phi2 is None
                              else jnp.broadcast_to(phi2[k], (M,)))
        # SoA (16, M) -> (M, 4, 4)
        Hr = jnp.moveaxis(Hr16, 0, -1).reshape(M, 4, 4)
        Hi = jnp.moveaxis(Hi16, 0, -1).reshape(M, 4, 4)
        # A = -i H tau / 2^s as an 8x8 real block
        s = 4
        scale = tau[k] / (2.0 ** s)
        A = _block8(Hi * scale, -Hr * scale)
        eye = jnp.eye(8, dtype=jnp.float32)
        # order-8 Paterson-Stockmeyer on 8x8 real blocks
        import math
        c = [1.0 / math.factorial(i) for i in range(9)]
        A2 = jnp.matmul(A, A, precision=P)
        A3 = jnp.matmul(A2, A, precision=P)
        A4 = jnp.matmul(A2, A2, precision=P)
        Ppoly = c[0] * eye + c[1] * A + c[2] * A2 + c[3] * A3
        Q = c[4] * eye + c[5] * A + c[6] * A2 + c[7] * A3 + c[8] * A4
        U = Ppoly + jnp.matmul(A4, Q, precision=P)
        for _ in range(s):
            U = jnp.matmul(U, U, precision=P)
        return U

    def body(carry, k):
        Uk = seg(k)
        return jnp.matmul(Uk, carry, precision=P), None

    U0 = jnp.broadcast_to(jnp.eye(8, dtype=jnp.float32), (M, 8, 8))
    out, _ = jax.lax.scan(body, U0, jnp.arange(pulses.shape[0]))
    return out


# ---------------------------------------------------------------------------
# Variant 2: structure-tensor squaring (fixed-operand MXU contraction)
# ---------------------------------------------------------------------------

def _structure_matrix():
    """Fixed (32, 1024) real matrix M with
    vec_ri(U @ V) = M @ vec(outer_ri(U, V)).

    Entry basis e = 4*i + j.  (U@V)[i,j] = sum_k U[i,k] V[k,j]: complex, so
    re/im outputs each draw from the 2*2 re/im product combinations of the
    256*4 pairwise products.  We lay the monomial vector out as
    [Ur_a*Vr_b, Ur_a*Vi_b, Ui_a*Vr_b, Ui_a*Vi_b] for a, b in 16x16."""
    S = np.zeros((32, 4, 16, 16), np.float32)  # (out, comb, a, b)
    for i in range(4):
        for j in range(4):
            e = 4 * i + j
            for k in range(4):
                a, b = 4 * i + k, 4 * k + j
                # re: Ur*Vr - Ui*Vi ; im: Ur*Vi + Ui*Vr
                S[e, 0, a, b] += 1.0      # rr -> re
                S[e, 3, a, b] -= 1.0      # ii -> re
                S[16 + e, 1, a, b] += 1.0  # ri -> im
                S[16 + e, 2, a, b] += 1.0  # ir -> im
    return jnp.asarray(S.reshape(32, 4 * 256))


_SMAT = None


def _square_structmm(Ur16, Ui16, smat):
    """One squaring step in SoA (16, M) layout via the fixed contraction."""
    # monomials: (4, 16, 16, M) -> (1024, M) on the VPU
    rr = Ur16[:, None, :] * Ur16[None, :, :]
    ri = Ur16[:, None, :] * Ui16[None, :, :]
    ir = Ui16[:, None, :] * Ur16[None, :, :]
    ii = Ui16[:, None, :] * Ui16[None, :, :]
    mono = jnp.stack([rr, ri, ir, ii], 0).reshape(4 * 256, -1)
    out = jnp.matmul(smat, mono, precision=P)   # (32, M) on the MXU
    return out[:16], out[16:]


def propagate_structmm(pulses, delta1, delta2, epsilon, system):
    """SoA forward, but every squaring runs through the fixed-operand
    structure contraction (product chain kept on VPU — it is U@carry with
    two varying operands, no fixed-operand form)."""
    global _SMAT
    if _SMAT is None:
        _SMAT = _structure_matrix()
    smat = _SMAT
    M = delta1.shape[0]
    phi, tau = pulses[:, 0], pulses[:, -1]
    omega = pulses[:, 2] if pulses.shape[1] >= 4 else None
    phi2 = pulses[:, 1] if pulses.shape[1] >= 4 else None
    import math
    c = [1.0 / math.factorial(i) for i in range(9)]
    eye = jnp.asarray(su4._EYE16).reshape(16, 1)

    def body(carry, k):
        ph = jnp.broadcast_to(phi[k], (M,))
        Hr, Hi = su4._h16(ph, delta1, delta2, epsilon, system,
                          omega=None if omega is None
                          else jnp.broadcast_to(omega[k], (M,)),
                          phi2=None if phi2 is None
                          else jnp.broadcast_to(phi2[k], (M,)))
        s = 4
        scale = tau[k] / (2.0 ** s)
        Ar, Ai = Hi * scale, -Hr * scale
        A2 = su4._matmul16(Ar, Ai, Ar, Ai)
        A3 = su4._matmul16(A2[0], A2[1], Ar, Ai)
        A4 = su4._matmul16(A2[0], A2[1], A2[0], A2[1])
        Pr = c[0] * eye + c[1] * Ar + c[2] * A2[0] + c[3] * A3[0]
        Pi = c[1] * Ai + c[2] * A2[1] + c[3] * A3[1]
        Qr = c[4] * eye + c[5] * Ar + c[6] * A2[0] + c[7] * A3[0] + c[8] * A4[0]
        Qi = c[5] * Ai + c[6] * A2[1] + c[7] * A3[1] + c[8] * A4[1]
        Mr, Mi = su4._matmul16(A4[0], A4[1], Qr, Qi)
        Ur, Ui = Pr + Mr, Pi + Mi
        for _ in range(s):
            Ur, Ui = _square_structmm(Ur, Ui, smat)   # <- MXU
        cr, ci = carry
        return su4._matmul16(Ur, Ui, cr, ci), None

    U0r = jnp.broadcast_to(eye, (16, M))
    U0i = jnp.zeros((16, M), jnp.float32)
    (Ur, Ui), _ = jax.lax.scan(body, (U0r, U0i), jnp.arange(pulses.shape[0]))
    return Ur, Ui


# ---------------------------------------------------------------------------
# Harness
# ---------------------------------------------------------------------------

def timed(fn, pulses, d1, d2, ep, iters=8):
    """Chain-time `fn(pulses, d1, d2, ep)` on device (one dispatch).

    Per-call host timing is meaningless over the axon tunnel (~25 ms
    dispatch round-trip dwarfs the kernel); this matches the
    run_benchmarks.py methodology: scan `iters` evaluations with a carry
    perturbing tau so XLA cannot CSE them, subtract a 1-iteration run.
    """
    def step(c):
        out = fn(pulses.at[..., -1].add(c * 1e-12), d1, d2, ep)
        leaf = out[0] if isinstance(out, tuple) else out
        return c + jnp.sum(leaf[..., :1]) * 1e-20, None

    @jax.jit
    def run_full():
        c, _ = jax.lax.scan(lambda c, _: step(c), jnp.float32(0.0), None,
                            length=iters)
        return c

    @jax.jit
    def run_one():
        c, _ = step(jnp.float32(0.0))
        return c

    _ = float(run_full())
    _ = float(run_one())
    t_full, t_one = [], []
    for _ in range(3):
        t0 = time.perf_counter(); _ = float(run_full()); t_full.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); _ = float(run_one()); t_one.append(time.perf_counter() - t0)
    return max((min(t_full) - min(t_one)) / (iters - 1), 1e-9)


def main():
    L, M = 24, 16384
    system = su4.TwoQubitSystem()
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pulses = jnp.stack([
        jax.random.uniform(k1, (L,), minval=-3.1, maxval=3.1),
        jax.random.uniform(k1, (L,), minval=0.1, maxval=0.5)], -1)
    d1 = jax.random.normal(k2, (M,)) * 0.2
    d2 = jax.random.normal(k3, (M,)) * 0.2
    ep = jax.random.normal(k4, (M,)) * 0.05

    # baseline: SoA XLA path (single pulse table broadcast over MC)
    tiled = jnp.broadcast_to(pulses, (M, L, 2))
    base = jax.jit(lambda p, a, b, e: su4.propagate_su4(p, a, b, e, system))
    t_base = timed(base, tiled, d1, d2, ep)

    # production path: fused SoA Pallas kernel (B=1 target, MC-tiled)
    from universal_quantum_optimal_control_tpu.ops.propagate_su4_pallas import (  # noqa: E501
        propagate_su4_mc_pallas)
    pal = jax.jit(lambda p, a, b, e: propagate_su4_mc_pallas(
        p[None], a[None], b[None], e[None],
        xtalk=system.xtalk, coupling=system.coupling))
    t_pal = timed(pal, pulses, d1, d2, ep, iters=64)

    blk = jax.jit(lambda p, a, b, e: propagate_block8(p, a, b, e, system))
    t_blk = timed(blk, pulses, d1, d2, ep)

    stm = jax.jit(lambda p, a, b, e: propagate_structmm(p, a, b, e, system))
    t_stm = timed(stm, pulses, d1, d2, ep)

    # correctness cross-check (pallas / block8 / structmm vs SoA baseline)
    Ur0, Ui0 = base(tiled, d1, d2, ep)
    Pr, Pi = pal(pulses, d1, d2, ep)
    Pr, Pi = Pr[0], Pi[0]                        # (M, 4, 4)
    B8 = blk(pulses, d1, d2, ep)
    Ur_b, Ui_b = B8[:, :4, :4], B8[:, 4:, :4]
    if Ur0.shape[0] == 16:                       # SoA (16, M) on TPU
        Ur0 = jnp.moveaxis(Ur0, 0, -1).reshape(M, 4, 4)
        Ui0 = jnp.moveaxis(Ui0, 0, -1).reshape(M, 4, 4)
    err_blk = float(jnp.max(jnp.abs(Ur_b - Ur0) + jnp.abs(Ui_b - Ui0)))
    Sr, Si = stm(pulses, d1, d2, ep)
    Sr = jnp.moveaxis(Sr, 0, -1).reshape(M, 4, 4)
    Si = jnp.moveaxis(Si, 0, -1).reshape(M, 4, 4)
    err_stm = float(jnp.max(jnp.abs(Sr - Ur0) + jnp.abs(Si - Ui0)))
    err_pal = float(jnp.max(jnp.abs(Pr - Ur0) + jnp.abs(Pi - Ui0)))

    dev = jax.devices()[0]
    print(f"device: {dev}")
    print(f"L={L} M={M} forward props/s (1 prop = one L-segment sequence)")
    for name, t, err in [("soa_xla_baseline", t_base, 0.0),
                         ("soa_pallas_fused", t_pal, err_pal),
                         ("block8_batched_matmul", t_blk, err_blk),
                         ("structmm_fixed_operand", t_stm, err_stm)]:
        print(f"  {name:26s} {M / t:.3e} props/s   "
              f"({t * 1e3:.2f} ms)  max|dU|={err:.1e}")


if __name__ == "__main__":
    main()
