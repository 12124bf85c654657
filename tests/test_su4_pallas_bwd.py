"""SU(4) fused VJP kernel tests.

The kernel body is factored into pure-jnp SoA helpers, so the VJP *math*
(exponential chain adjoints, Hamiltonian-build chain rule) is tested here
directly against jax autodiff on plain arrays — no pallas interpreter in the
loop (interpret-mode execution of the full backward kernel is minutes-slow
on CPU; the end-to-end kernel-vs-XLA gradient equality runs on real TPU,
see BENCHMARKS.md / the workload smoke below).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from universal_quantum_optimal_control_tpu.ops import (
    propagate_su4_pallas_bwd as bwd,
)

SHAPE = (2, 8)


def _flat(m):
    return jnp.stack([m[r][c] for r in range(4) for c in range(4)])


def _unflat(f):
    return [[f[4 * r + c] for c in range(4)] for r in range(4)]


def _rand_mat(key, scale=0.2):
    ks = jax.random.split(key, 32)
    A = [[jax.random.normal(ks[4 * r + c], SHAPE) * scale for c in range(4)]
         for r in range(4)]
    B = [[jax.random.normal(ks[16 + 4 * r + c], SHAPE) * scale
          for c in range(4)] for r in range(4)]
    return A, B


def test_expm_chain_vjp_matches_autodiff():
    """_expm_vjp (squaring adjoints + Paterson-Stockmeyer adjoints) vs
    jax.grad through _expm_chain on the same real-pair inner product."""
    key = jax.random.PRNGKey(0)
    Ar, Ai = _rand_mat(key)
    kc1, kc2 = jax.random.split(jax.random.PRNGKey(1))
    Cr = jax.random.normal(kc1, (16,) + SHAPE)
    Ci = jax.random.normal(kc2, (16,) + SHAPE)
    scaling = 3

    def scalar(ar_f, ai_f):
        (ur, ui), _ = bwd._expm_chain(_unflat(ar_f), _unflat(ai_f), scaling)
        return jnp.sum(_flat(ur) * Cr) + jnp.sum(_flat(ui) * Ci)

    gr, gi = jax.grad(scalar, argnums=(0, 1))(_flat(Ar), _flat(Ai))
    (_, _), res = bwd._expm_chain(Ar, Ai, scaling)
    dAr, dAi = bwd._expm_vjp(_unflat(Cr), _unflat(Ci), Ar, Ai, res)
    scale = float(jnp.abs(gr).max())
    np.testing.assert_allclose(np.asarray(_flat(dAr)), np.asarray(gr),
                               atol=2e-3 * scale)
    np.testing.assert_allclose(np.asarray(_flat(dAi)), np.asarray(gi),
                               atol=2e-3 * scale)


def test_build_A_param_chain_matches_autodiff():
    """The sparse-Hamiltonian parameter chain rule coded in _bwd_kernel
    (dφ/dΩ/dτ/dδ/dε from the cotangent of A) vs jax autodiff through
    _build_A."""
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 8)
    phi = jax.random.uniform(ks[0], SHAPE, minval=-np.pi, maxval=np.pi)
    om = jax.random.uniform(ks[1], SHAPE, minval=0.2, maxval=1.0)
    tau = jax.random.uniform(ks[2], SHAPE, minval=0.1, maxval=0.5)
    d1 = jax.random.normal(ks[3], SHAPE) * 0.3
    d2 = jax.random.normal(ks[4], SHAPE) * 0.3
    eps = jax.random.normal(ks[5], SHAPE) * 0.05
    Dr = jax.random.normal(ks[6], (16,) + SHAPE)
    Di = jax.random.normal(ks[7], (16,) + SHAPE)
    xtalk, coupling, scaling = 0.1, 0.5, 4

    def scalar(phi, om, tau, d1, d2, eps):
        Ar, Ai, _, _, _ = bwd._build_A(phi, om, tau, d1, d2, eps,
                                       xtalk=xtalk, coupling=coupling,
                                       scaling=scaling)
        return (jnp.sum(_flat(Ar) * Dr) + jnp.sum(_flat(Ai) * Di))

    g_auto = jax.grad(scalar, argnums=(0, 1, 2, 3, 4, 5))(
        phi, om, tau, d1, d2, eps)

    # manual chain (mirrors _bwd_kernel's segment-gradient block)
    Ar, Ai, Kr, Ki, (c, s, amp, relu_om, t, _c2, _s2) = bwd._build_A(
        phi, om, tau, d1, d2, eps, xtalk=xtalk, coupling=coupling,
        scaling=scaling)
    Drm, Dim = _unflat(Dr), _unflat(Di)
    zero = jnp.zeros_like(d1)
    dt = zero
    for r in range(4):
        for cc in range(4):
            dt += Drm[r][cc] * Kr[r][cc] + Dim[r][cc] * Ki[r][cc]
    dtau = dt / (2.0 ** scaling)
    ddg = [-t * Dim[i][i] for i in range(4)]
    dd1 = 0.5 * (ddg[0] + ddg[1] - ddg[2] - ddg[3])
    dd2 = 0.5 * (ddg[0] - ddg[1] + ddg[2] - ddg[3])
    dh1r = dh1i = dh2r = dh2i = zero
    for r, cc, which, sgn in bwd._COUPLINGS:
        dhr = -t * Dim[r][cc]
        dhi = sgn * t * Drm[r][cc]
        if which == "g1":
            dh1r, dh1i = dh1r + dhr, dh1i + dhi
        else:
            dh2r, dh2i = dh2r + dhr, dh2i + dhi
    Pc = dh1r + xtalk * dh2r
    Ps = dh1i + xtalk * dh2i
    damp = c * Pc - s * Ps
    dphi = amp * (-s * Pc - c * Ps)
    deps = 0.5 * relu_om * damp
    dom = 0.5 * (1.0 + eps) * jnp.where(relu_om > 0.0, damp, 0.0)

    for name, manual, auto in zip(
            ("dphi", "dom", "dtau", "dd1", "dd2", "deps"),
            (dphi, dom, dtau, dd1, dd2, deps), g_auto):
        scale = max(float(jnp.abs(auto).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(manual), np.asarray(auto),
                                   atol=1e-4 * scale, err_msg=name)


@pytest.mark.slow
def test_full_vjp_kernel_interpret_matches_xla_autodiff():
    """End-to-end fused VJP kernel (L/R sweep, SMEM accumulation, M=200
    padding mask) vs jax.grad through the XLA SoA objective — interpret mode.

    Guards the kernel ASSEMBLY (the pure-jnp helper tests above cover only
    the math).  On CPU the kernels self-select ``interpret=True``
    (``_interpret()``) — the lightweight pallas interpreter, NOT
    ``force_tpu_interpret_mode`` (whose Mosaic-semantics simulation takes
    >40 min on this kernel).  Measured reality (2026-08, both before and
    after the SMEM-streaming change): the interpret-mode FORWARD calls run
    in ~25 s each, but XLA's CPU backend takes >45 min of single-core time
    just to COMPILE the bwd kernel program (``slow_operation_alarm`` fires
    on ``jit_su4_objective_vjp_from_product``) — the flat ~35-carry reverse
    sweep with fully unrolled SoA matmul chains blows up CPU-backend
    optimization, while the TPU/Mosaic compile of the same kernel is
    seconds.  Run this on a multi-core box or not at all; the kernel
    assembly is validated on real TPU hardware every round (grads <=8e-6
    rel vs XLA at B in {2,8,200}, L in {3,24}, incl. the M=200 padding
    mask — BENCHMARKS.md).  Hence the slow marker."""
    from universal_quantum_optimal_control_tpu.core import su4
    from universal_quantum_optimal_control_tpu.training.systems import (
        SU4System,
    )

    rng = np.random.default_rng(21)
    B, L, M = 2, 3, 200  # M=200 exercises the lane-padding mask
    pulses = jnp.asarray(np.stack(
        [rng.uniform(-np.pi, np.pi, (B, L)),
         rng.uniform(0.1, 1.2, (B, L)),
         rng.uniform(0.1, 0.4, (B, L))], axis=-1).astype(np.float32))
    d1 = jnp.asarray(rng.normal(0, 0.3, (B, M)).astype(np.float32))
    d2 = jnp.asarray(rng.normal(0, 0.3, (B, M)).astype(np.float32))
    ep = jnp.asarray(rng.normal(0, 0.05, (B, M)).astype(np.float32))

    sys_ = su4.TwoQubitSystem()
    # random SU(4)-ish targets from a zero-disorder propagation
    Ur, Ui = su4.propagate_su4(
        jnp.asarray(np.stack(
            [rng.uniform(-np.pi, np.pi, (B, 4)),
             rng.uniform(0.3, 1.0, (B, 4)),
             rng.uniform(0.1, 0.4, (B, 4))], axis=-1).astype(np.float32)),
        jnp.zeros(B), jnp.zeros(B), jnp.zeros(B), sys_)
    t_r, t_i = Ur, Ui

    def obj_pallas(p, a, b, e):
        return jnp.mean(bwd.mean_fidelity_su4_trainable(
            p, t_r, t_i, a, b, e, sys_.xtalk, sys_.coupling,
            sys_.expm_scaling))

    def obj_xla(p, a, b, e):
        Vr, Vi = su4.propagate_su4_mc(p, a, b, e, sys_)
        F = su4.fidelity_su4_ri(Vr, Vi, t_r[:, None], t_i[:, None])
        return jnp.mean(jnp.mean(F, axis=1))

    v_p, g_p = jax.value_and_grad(obj_pallas, argnums=(0, 1, 2, 3))(
        pulses, d1, d2, ep)
    v_x, g_x = jax.value_and_grad(obj_xla, argnums=(0, 1, 2, 3))(
        pulses, d1, d2, ep)
    np.testing.assert_allclose(float(v_p), float(v_x), atol=1e-6)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_drive2_vjp_kernel_interpret_matches_xla_autodiff():
    """drive2 end-to-end fused VJP (4-parameter pulses incl. the dphi2
    channel) vs jax.grad through the XLA drive2 objective — interpret mode.
    Same protocol as the cross-talk-only twin above."""
    from universal_quantum_optimal_control_tpu.core import su4

    rng = np.random.default_rng(23)
    B, L, M = 2, 3, 200
    pulses = jnp.asarray(np.stack(
        [rng.uniform(-np.pi, np.pi, (B, L)),
         rng.uniform(-np.pi, np.pi, (B, L)),
         rng.uniform(0.1, 1.2, (B, L)),
         rng.uniform(0.1, 0.4, (B, L))], axis=-1).astype(np.float32))
    d1 = jnp.asarray(rng.normal(0, 0.3, (B, M)).astype(np.float32))
    d2 = jnp.asarray(rng.normal(0, 0.3, (B, M)).astype(np.float32))
    ep = jnp.asarray(rng.normal(0, 0.05, (B, M)).astype(np.float32))

    sys_ = su4.TwoQubitSystem(drive2=True)
    tgt_pulses = jnp.asarray(np.stack(
        [rng.uniform(-np.pi, np.pi, (B, 4)),
         rng.uniform(-np.pi, np.pi, (B, 4)),
         rng.uniform(0.3, 1.0, (B, 4)),
         rng.uniform(0.1, 0.4, (B, 4))], axis=-1).astype(np.float32))
    t_r, t_i = su4.propagate_su4(tgt_pulses, jnp.zeros(B), jnp.zeros(B),
                                 jnp.zeros(B), sys_)

    def obj_pallas(p, a, b, e):
        return jnp.mean(bwd.mean_fidelity_su4_trainable(
            p, t_r, t_i, a, b, e, sys_.xtalk, sys_.coupling,
            sys_.expm_scaling, True))

    def obj_xla(p, a, b, e):
        Vr, Vi = su4.propagate_su4_mc(p, a, b, e, sys_)
        F = su4.fidelity_su4_ri(Vr, Vi, t_r[:, None], t_i[:, None])
        return jnp.mean(jnp.mean(F, axis=1))

    v_p, g_p = jax.value_and_grad(obj_pallas, argnums=(0, 1, 2, 3))(
        pulses, d1, d2, ep)
    v_x, g_x = jax.value_and_grad(obj_xla, argnums=(0, 1, 2, 3))(
        pulses, d1, d2, ep)
    np.testing.assert_allclose(float(v_p), float(v_x), atol=1e-6)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
