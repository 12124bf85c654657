"""SU(4) propagator tests against dense complex oracles."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import expm

from universal_quantum_optimal_control_tpu.core import su4


def dense_H(phi, d1, d2, eps, sys_):
    P = su4.pauli_strings()
    amp = 0.5 * (1 + eps)
    return (amp * (np.cos(phi) * P["X1"] + np.sin(phi) * P["Y1"]
                   + sys_.xtalk * (np.cos(phi) * P["X2"] + np.sin(phi) * P["Y2"]))
            + 0.5 * (d1 * P["Z1"] + d2 * P["Z2"])
            + sys_.coupling * P["ZZ"])


def test_hamiltonian_matches_dense():
    sys_ = su4.TwoQubitSystem(xtalk=0.2, coupling=0.4)
    rng = np.random.default_rng(0)
    phi, d1, d2, eps = rng.uniform(-np.pi, np.pi), 0.3, -0.5, 0.04
    Hr, Hi = su4.su4_hamiltonian(jnp.float32(phi), jnp.float32(d1),
                                 jnp.float32(d2), jnp.float32(eps), sys_)
    H = dense_H(phi, d1, d2, eps, sys_)
    np.testing.assert_allclose(np.asarray(Hr), H.real, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Hi), H.imag, atol=1e-6)
    # Hermitian
    np.testing.assert_allclose(np.asarray(Hr), np.asarray(Hr).T, atol=1e-6)
    np.testing.assert_allclose(np.asarray(Hi), -np.asarray(Hi).T, atol=1e-6)


def test_expm_taylor_matches_scipy():
    sys_ = su4.TwoQubitSystem(xtalk=0.15, coupling=0.5)
    rng = np.random.default_rng(1)
    for _ in range(5):
        phi = rng.uniform(-np.pi, np.pi)
        d1, d2 = rng.normal(0, 0.5, 2)
        eps = rng.normal(0, 0.05)
        tau = rng.uniform(0.05, 1.5)
        Hr, Hi = su4.su4_hamiltonian(jnp.float32(phi), jnp.float32(d1),
                                     jnp.float32(d2), jnp.float32(eps), sys_)
        Ur, Ui = su4.expm_taylor_ri(Hr, Hi, jnp.float32(tau))
        U = np.asarray(su4.complex_from_ri(Ur, Ui))
        H = dense_H(phi, d1, d2, eps, sys_)
        U_ref = np.asarray(expm(jnp.asarray(-1j * H * tau, jnp.complex64)))
        np.testing.assert_allclose(U, U_ref, atol=5e-6)


def test_propagate_su4_unitary_and_order():
    sys_ = su4.TwoQubitSystem()
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    B, L = 3, 7
    pulses = jnp.stack([
        jax.random.uniform(k1, (B, L), minval=-np.pi, maxval=np.pi),
        jax.random.uniform(k2, (B, L), minval=0.05, maxval=0.4)], axis=-1)
    d1 = jnp.asarray([0.1, -0.2, 0.0])
    d2 = jnp.asarray([0.0, 0.3, -0.1])
    eps = jnp.asarray([0.02, -0.01, 0.0])
    Ur, Ui = su4.propagate_su4(pulses, d1, d2, eps, sys_)
    U = np.asarray(su4.complex_from_ri(Ur, Ui))

    # unitarity
    for b in range(B):
        np.testing.assert_allclose(U[b].conj().T @ U[b], np.eye(4), atol=2e-5)

    # order: sequential dense product U_L ... U_1
    for b in range(B):
        Uref = np.eye(4, dtype=np.complex64)
        for k in range(L):
            H = dense_H(float(pulses[b, k, 0]), float(d1[b]), float(d2[b]),
                        float(eps[b]), sys_)
            Uk = np.asarray(expm(jnp.asarray(
                -1j * H * float(pulses[b, k, 1]), jnp.complex64)))
            Uref = Uk @ Uref
        np.testing.assert_allclose(U[b], Uref, atol=2e-5)


@pytest.mark.slow
def test_soa_and_ri_layouts_agree():
    """The SoA (entries-leading, TPU) and trailing-(4,4) (CPU) scan layouts
    must be numerically identical — they are the same math in different
    memory orders."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    B, L = 3, 12
    pulses = jnp.stack([
        jax.random.uniform(k1, (B, L), minval=-np.pi, maxval=np.pi),
        jax.random.uniform(k2, (B, L), minval=0.1, maxval=0.5)], axis=-1)
    d1 = jnp.asarray([0.1, -0.3, 0.0])
    d2 = jnp.asarray([-0.1, 0.2, 0.4])
    ep = jnp.asarray([0.02, 0.0, -0.05])
    Ur_s, Ui_s = su4.propagate_su4(pulses, d1, d2, ep, layout="soa")
    Ur_r, Ui_r = su4.propagate_su4(pulses, d1, d2, ep, layout="ri")
    np.testing.assert_allclose(np.asarray(Ur_s), np.asarray(Ur_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(Ui_s), np.asarray(Ui_r), atol=1e-5)
    # 3-parameter (phi, Omega, tau) space too
    om = jax.random.uniform(jax.random.PRNGKey(1), (B, L))
    p3 = jnp.concatenate([pulses[..., :1], om[..., None], pulses[..., 1:]],
                         axis=-1)
    Ur_s, Ui_s = su4.propagate_su4(p3, d1, d2, ep, layout="soa")
    Ur_r, Ui_r = su4.propagate_su4(p3, d1, d2, ep, layout="ri")
    np.testing.assert_allclose(np.asarray(Ur_s), np.asarray(Ur_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(Ui_s), np.asarray(Ui_r), atol=1e-5)


def test_propagate_su4_long_sequence_unitarity():
    """L=40 (the two-qubit training length): |U^H U - I| must stay < 1e-4.

    Guards the matmul precision pin in su4._matmul_ri — on TPU the default
    MXU precision truncates f32 inputs to bf16, which compounded into ~2%
    non-unitarity over 40 segments (measured eval 'fidelity' 1.04 on v5e);
    with Precision.HIGHEST the drift is ~1e-5 on TPU and CPU alike."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    B, L = 4, 40
    pulses = jnp.stack([
        jax.random.uniform(k1, (B, L), minval=-np.pi, maxval=np.pi),
        jax.random.uniform(k2, (B, L), minval=0.1, maxval=0.5)], axis=-1)
    z = jnp.zeros(B)
    Ur, Ui = jax.jit(lambda p: su4.propagate_su4(p, z, z, z))(pulses)
    U = np.asarray(su4.complex_from_ri(Ur, Ui))
    for b in range(B):
        np.testing.assert_allclose(U[b].conj().T @ U[b], np.eye(4),
                                   atol=1e-4)
    # self-fidelity may not exceed 1 beyond float error
    F = np.asarray(su4.fidelity_su4_ri(Ur, Ui, Ur, Ui))
    assert F.max() <= 1.0 + 1e-4


def test_propagate_su4_mc_matches_flat():
    sys_ = su4.TwoQubitSystem()
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 5)
    B, L, M = 2, 5, 4
    pulses = jnp.stack([
        jax.random.uniform(ks[0], (B, L), minval=-np.pi, maxval=np.pi),
        jax.random.uniform(ks[1], (B, L), minval=0.05, maxval=0.4)], axis=-1)
    d1 = jax.random.normal(ks[2], (B, M))
    d2 = jax.random.normal(ks[3], (B, M))
    eps = jax.random.normal(ks[4], (B, M)) * 0.05
    Ur, Ui = su4.propagate_su4_mc(pulses, d1, d2, eps, sys_)
    assert Ur.shape == (B, M, 4, 4)
    # spot check one (b, m) against flat call
    Ur1, Ui1 = su4.propagate_su4(pulses[1], d1[1, 2], d2[1, 2], eps[1, 2], sys_)
    np.testing.assert_allclose(np.asarray(Ur[1, 2]), np.asarray(Ur1), atol=1e-5)


def test_fidelity_su4():
    I4r, I4i = jnp.eye(4), jnp.zeros((4, 4))
    np.testing.assert_allclose(
        float(su4.fidelity_su4_ri(I4r, I4i, I4r, I4i)), 1.0, atol=1e-6)
    # orthogonal target (X1): Tr = 0 -> F = 4/20 = 0.2
    P = su4.pauli_strings()
    Xr, Xi = jnp.asarray(P["X1"].real, jnp.float32), jnp.asarray(P["X1"].imag, jnp.float32)
    np.testing.assert_allclose(
        float(su4.fidelity_su4_ri(I4r, I4i, Xr, Xi)), 0.2, atol=1e-6)
    # matches the generic complex-matrix implementation
    from universal_quantum_optimal_control_tpu.core.objectives import (
        entanglement_fidelity,
    )
    key = jax.random.PRNGKey(5)
    A = jax.random.normal(key, (4, 4, 2))
    U = jnp.linalg.qr(A[..., 0] + 1j * A[..., 1])[0][None].astype(jnp.complex64)
    V = jnp.eye(4, dtype=jnp.complex64)[None]
    f_ref = entanglement_fidelity(U, V)
    f_ri = su4.fidelity_su4_ri(jnp.real(U), jnp.imag(U),
                               jnp.real(V), jnp.imag(V))
    np.testing.assert_allclose(np.asarray(f_ri), np.asarray(f_ref), atol=1e-5)


def test_su4_gradients_flow():
    sys_ = su4.TwoQubitSystem()
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    pulses = jnp.stack([
        jax.random.uniform(k1, (1, 4), minval=-np.pi, maxval=np.pi),
        jax.random.uniform(k2, (1, 4), minval=0.1, maxval=0.4)], axis=-1)
    # target: CZ-like diag gate
    T = jnp.diag(jnp.asarray([1, 1, 1, -1], jnp.complex64))[None]

    def loss(p):
        Ur, Ui = su4.propagate_su4(p, jnp.zeros(1), jnp.zeros(1), jnp.zeros(1),
                                   sys_)
        return 1.0 - jnp.mean(su4.fidelity_su4_ri(
            Ur, Ui, jnp.real(T), jnp.imag(T)))

    g = jax.grad(loss)(pulses)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0

    # finite difference
    e = jnp.zeros_like(pulses).at[0, 1, 0].set(1.0)
    h = 1e-3
    fd = (loss(pulses + h * e) - loss(pulses - h * e)) / (2 * h)
    np.testing.assert_allclose(float(g[0, 1, 0]), float(fd), atol=1e-3)


def test_su4_analysis_plots(tmp_path):
    """Two-qubit fidelity surface peaks at zero disorder for a target that is
    the zero-disorder propagation of the same pulses; plots render."""
    from universal_quantum_optimal_control_tpu.analysis import (
        fidelity_by_std_su4,
        fidelity_contour_plot_su4,
        fidelity_grid_su4,
    )

    sys_ = su4.TwoQubitSystem()
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    pulses = jnp.stack([
        jax.random.uniform(k1, (6,), minval=-np.pi, maxval=np.pi),
        jax.random.uniform(k2, (6,), minval=0.1, maxval=0.4)], axis=-1)
    Ur, Ui = su4.propagate_su4(pulses[None], jnp.zeros(1), jnp.zeros(1),
                               jnp.zeros(1), sys_)
    target = jnp.stack([Ur[0], Ui[0]])  # packed (2, 4, 4)

    dg, F = fidelity_grid_su4(pulses, target, sys_, n_delta=41)
    i0 = np.argmin(np.abs(dg))
    assert F[i0, i0] > 1 - 1e-4
    assert np.all(F <= 1 + 1e-5)

    out = tmp_path / "su4_contour.png"
    fidelity_contour_plot_su4(pulses, target, sys_, save_path=str(out),
                              n_delta=41)
    assert out.stat().st_size > 10000

    stds, mean, se = fidelity_by_std_su4(pulses, target, sys_,
                                         stds=np.arange(0.1, 1.0, 0.2),
                                         monte_carlo=256)
    assert mean[0] > mean[-1]  # decays with disorder


# ---------------------------------------------------------------------------
# drive2 system variant (direct drive line on qubit 2, symmetric cross-talk)
# ---------------------------------------------------------------------------


def dense_H_drive2(phi1, phi2, om, d1, d2, eps, sys_):
    P = su4.pauli_strings()
    amp = 0.5 * (1 + eps) * max(om, 0.0)
    chi = sys_.xtalk
    line1 = np.cos(phi1) * P["X1"] + np.sin(phi1) * P["Y1"] + chi * (
        np.cos(phi1) * P["X2"] + np.sin(phi1) * P["Y2"])
    line2 = np.cos(phi2) * P["X2"] + np.sin(phi2) * P["Y2"] + chi * (
        np.cos(phi2) * P["X1"] + np.sin(phi2) * P["Y1"])
    return (amp * (line1 + line2)
            + 0.5 * (d1 * P["Z1"] + d2 * P["Z2"])
            + sys_.coupling * P["ZZ"])


def test_drive2_propagator_matches_dense_oracle():
    sys_ = su4.TwoQubitSystem(xtalk=0.1, coupling=0.5, drive2=True)
    rng = np.random.default_rng(3)
    B, L = 2, 5
    pulses = np.stack([
        rng.uniform(-np.pi, np.pi, (B, L)),
        rng.uniform(-np.pi, np.pi, (B, L)),
        rng.uniform(0.2, 1.5, (B, L)),
        rng.uniform(0.05, 0.4, (B, L))], axis=-1).astype(np.float32)
    d1 = np.array([0.2, -0.4], np.float32)
    d2 = np.array([-0.1, 0.3], np.float32)
    eps = np.array([0.03, -0.02], np.float32)

    for layout in ("ri", "soa"):
        Ur, Ui = su4.propagate_su4(jnp.asarray(pulses), jnp.asarray(d1),
                                   jnp.asarray(d2), jnp.asarray(eps), sys_,
                                   layout=layout)
        U = np.asarray(su4.complex_from_ri(Ur, Ui))
        for b in range(B):
            Uref = np.eye(4, dtype=np.complex64)
            for k in range(L):
                H = dense_H_drive2(*[float(pulses[b, k, i]) for i in range(3)],
                                   float(d1[b]), float(d2[b]), float(eps[b]),
                                   sys_)
                Uk = np.asarray(expm(jnp.asarray(
                    -1j * H * float(pulses[b, k, 3]), jnp.complex64)))
                Uref = Uk @ Uref
            np.testing.assert_allclose(U[b], Uref, atol=3e-5, err_msg=layout)


def test_drive2_enables_delta2_echo():
    """The physics the variant exists for: simultaneous X1X2(pi) echo pulses
    (expressible ONLY with a direct qubit-2 drive) refocus BOTH delta1 and
    delta2 while commuting with the ZZ coupling — the no-echo free evolution
    dephases badly at the same delta2."""
    sys_ = su4.TwoQubitSystem(xtalk=0.0, coupling=0.5, drive2=True)
    T, om, tpi = 2.0, 200.0, np.pi / 200.0  # near-instantaneous pi pulses
    echo = jnp.asarray([[0.0, 0.0, 0.0, T], [0.0, 0.0, om, tpi],
                        [0.0, 0.0, 0.0, T], [0.0, 0.0, om, tpi]],
                       jnp.float32)[None]
    free = jnp.asarray([[0.0, 0.0, 0.0, 2 * T + 2 * tpi]],
                       jnp.float32)[None]

    d2 = jnp.asarray([0.8])
    zero = jnp.zeros(1)
    # target: the respective sequence at zero disorder
    for pulses in (echo, free):
        tr, ti = su4.propagate_su4(pulses, zero, zero, zero, sys_)
        Ur, Ui = su4.propagate_su4(pulses, zero, d2, zero, sys_)
        F = float(su4.fidelity_su4_ri(Ur, Ui, tr, ti)[0])
        if pulses is echo:
            f_echo = F
        else:
            f_free = F
    assert f_echo > 0.995, f_echo
    assert f_free < 0.90, f_free


def test_drive2_requires_4_param_pulses():
    """drive2 expects the 4-parameter (phi1, phi2, omega, tau) space on
    every backend (the fused kernels support drive2 since round 3 — the old
    NotImplementedError guard is gone; pallas parity is covered by
    tests/test_su4_pallas.py::test_su4_pallas_drive2_*)."""
    import pytest

    sys_ = su4.TwoQubitSystem(drive2=True)
    pulses = jnp.zeros((1, 3, 3))
    with pytest.raises(ValueError, match="drive2"):
        su4.propagate_su4(pulses, jnp.zeros(1), jnp.zeros(1), jnp.zeros(1),
                          sys_)


def test_drive2_grape_smoke():
    """Tiny multi-start GRAPE in drive2 mode runs end-to-end and produces
    (L, 4) pulses with finite fidelity."""
    from universal_quantum_optimal_control_tpu.optimizers.two_qubit_grape import (
        TwoQubitGrapeConfig,
        multistart_grape_su4,
        named_two_qubit_targets,
    )

    cfg = TwoQubitGrapeConfig(mode="blocks", n_blocks=3, n_starts=2,
                              steps=10, drive2=True)
    pulses, info = multistart_grape_su4(named_two_qubit_targets()["cz"], cfg)
    assert pulses.shape == (6, 4)
    assert 0.0 <= info["stages"][0]["best_fid"] <= 1.0 + 1e-6
