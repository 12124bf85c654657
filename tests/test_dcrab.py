"""dCRAB tests: objective parity with a dense oracle, both optimizer modes."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import expm

from universal_quantum_optimal_control_tpu.core import su2
from universal_quantum_optimal_control_tpu.optimizers import dcrab

SX = np.array([[0, 1], [1, 0]], dtype=np.complex64)
SY = np.array([[0, -1j], [1j, 0]], dtype=np.complex64)
SZ = np.array([[1, 0], [0, -1]], dtype=np.complex64)


def dense_infidelity(params, t, omegas, U_target, deltas, epss, dt):
    """Independent dense re-derivation of the reference objective
    (dCRAB.py:26-59): sequential expm propagation + unsquared-trace fidelity."""
    N = len(omegas)
    phi0, a, b = params[0], params[1:1 + N], params[1 + N:]
    phi_vals = phi0 + sum(a[n] * np.cos(omegas[n] * t)
                          + b[n] * np.sin(omegas[n] * t) for n in range(N))
    fids = []
    for d, e in zip(deltas, epss):
        U = np.eye(2, dtype=np.complex64)
        for phi in phi_vals:
            H = (np.cos(phi) * SX + np.sin(phi) * SY + d * SZ) * (1 + e) / 2
            U = np.asarray(expm(jnp.asarray(-1j * H * dt, jnp.complex64))) @ U
        tr = np.trace(U_target.conj().T @ U)
        fids.append((np.abs(tr) + 2) / 6)
    return 1 - np.mean(fids)


def test_objective_matches_dense_oracle():
    rng = np.random.default_rng(0)
    N, T, dt, S = 3, 1.0, 0.05, 4
    t = np.arange(0, T, dt)
    omegas = rng.uniform(0.1, 5.0, N)
    params = np.concatenate([[0.3], 0.2 * rng.standard_normal(2 * N)])
    deltas = rng.normal(0, 0.4, S)
    epss = rng.normal(0, 0.05, S)
    U_target = np.asarray(expm(jnp.asarray(-1j * (np.pi / 2) * SX / 2,
                                           jnp.complex64)))

    ref = dense_infidelity(params, t, omegas, U_target, deltas, epss, dt)
    got = dcrab.average_infidelity(
        jnp.asarray(params, jnp.float32), jnp.asarray(t, jnp.float32),
        jnp.asarray(omegas, jnp.float32), su2.su2_to_quat(jnp.asarray(U_target)),
        jnp.asarray(deltas, jnp.float32), jnp.asarray(epss, jnp.float32), dt)
    np.testing.assert_allclose(float(got), ref, atol=2e-4)


def test_build_phi_matmul_matches_loop():
    rng = np.random.default_rng(1)
    N, Tn = 5, 40
    t = jnp.linspace(0, 2.0, Tn)
    omegas = jnp.asarray(rng.uniform(0, 8, N), jnp.float32)
    params = jnp.asarray(np.concatenate([[0.1], rng.standard_normal(2 * N)]),
                         jnp.float32)
    got = dcrab.build_phi(params, t, omegas)
    expect = params[0] + sum(
        params[1 + n] * jnp.cos(omegas[n] * t)
        + params[1 + N + n] * jnp.sin(omegas[n] * t) for n in range(N))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)


def small_cfg(**kw):
    d = dict(T=2.0, dt=0.05, n_modes=4, rounds=3, samples=32,
             w_min=0.1, w_max=6.0, delta_std=0.2, epsilon_std=0.02, seed=42)
    d.update(kw)
    return dcrab.DcrabConfig(**d)


def x_half_target():
    return np.asarray(expm(jnp.asarray(-1j * (np.pi / 2) * SX / 2,
                                       jnp.complex64)))


def test_grad_mode_improves_fidelity():
    cfg = small_cfg()
    (params, omegas), fid = dcrab.optimize_dcrab_grad(
        x_half_target(), cfg, steps=150, learning_rate=0.05)
    assert params.shape == (1 + 2 * cfg.n_modes,)
    assert omegas.shape == (cfg.n_modes,)
    # unsquared-trace fidelity maxes at 2/3; random start is ~0.5
    assert fid > 0.6


def test_nm_mode_improves_fidelity():
    cfg = small_cfg()
    (params, omegas), fid = dcrab.optimize_dcrab_nm(
        x_half_target(), cfg, maxiter=300)
    assert fid > 0.55


def test_nm_matches_scipy_direction():
    """JAX-native NM and SciPy NM should both find reasonable optima on the
    same problem (not identical paths, but comparable quality)."""
    cfg = small_cfg(rounds=2)
    (_, _), fid_jax = dcrab.optimize_dcrab_nm(x_half_target(), cfg,
                                              maxiter=200)
    (_, _), fid_scipy = dcrab.optimize_dcrab_nm(x_half_target(), cfg,
                                                maxiter=200, use_scipy=True)
    assert fid_jax > 0.55 and fid_scipy > 0.55


def test_front_door_dispatch():
    cfg_kwargs = dict(T=1.0, dt=0.05, n_modes=2, rounds=2, samples=16,
                      w_min=0.1, w_max=4.0, seed=1)
    (_, _), fid = dcrab.dcrab_optimize(x_half_target(), mode="grad",
                                       steps=50, **cfg_kwargs)
    assert 0.0 < fid <= 2 / 3 + 1e-6
