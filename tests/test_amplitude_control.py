"""3-parameter (φ, Ω, τ) pulse-space tests — amplitude-modulated drive."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import expm

from universal_quantum_optimal_control_tpu.core import propagate, su2, su4

SX = np.array([[0, 1], [1, 0]], dtype=np.complex64)
SY = np.array([[0, -1j], [1j, 0]], dtype=np.complex64)
SZ = np.array([[1, 0], [0, -1]], dtype=np.complex64)


def test_su2_amp_propagator_matches_dense():
    rng = np.random.default_rng(0)
    B, L = 4, 7
    phi = rng.uniform(-np.pi, np.pi, (B, L)).astype(np.float32)
    omega = rng.uniform(0.0, 1.5, (B, L)).astype(np.float32)
    tau = rng.uniform(0.05, 0.5, (B, L)).astype(np.float32)
    pulses = np.stack([phi, omega, tau], axis=-1)
    delta = rng.normal(0, 0.5, B).astype(np.float32)
    eps = rng.normal(0, 0.05, B).astype(np.float32)

    q = propagate.propagate_scan(jnp.asarray(pulses), jnp.asarray(delta),
                                 jnp.asarray(eps))
    U = np.asarray(su2.quat_to_su2(q))
    for b in range(B):
        Uref = np.eye(2, dtype=np.complex64)
        for k in range(L):
            H = 0.5 * (1 + eps[b]) * (
                omega[b, k] * (np.cos(phi[b, k]) * SX
                               + np.sin(phi[b, k]) * SY)
                + delta[b] * SZ)
            Uk = np.asarray(expm(jnp.asarray(-1j * H * tau[b, k],
                                             jnp.complex64)))
            Uref = Uk @ Uref
        np.testing.assert_allclose(U[b], Uref, atol=2e-5)


def test_omega_zero_is_free_evolution():
    """Ω = 0 segments evolve only under the disorder δ·Z — free evolution,
    inexpressible in the 2-parameter fixed-amplitude space."""
    pulses = jnp.asarray([[[0.7, 0.0, 1.3]]])  # one segment, omega 0
    delta = jnp.asarray([0.8])
    q = propagate.propagate_scan(pulses, delta, jnp.zeros(1))
    # expect exp(-i * 0.5*delta*tau * Z)
    expect = su2.axis_angle_to_quat(jnp.asarray([0.0, 0.0, 1.0]),
                                    jnp.asarray(0.8 * 1.3))
    np.testing.assert_allclose(np.asarray(q[0]), np.asarray(expect),
                               atol=1e-6)


def test_omega_one_reduces_to_two_param():
    rng = np.random.default_rng(1)
    B, L = 3, 5
    phi = rng.uniform(-np.pi, np.pi, (B, L)).astype(np.float32)
    tau = rng.uniform(0.05, 0.5, (B, L)).astype(np.float32)
    delta = rng.normal(0, 0.5, B).astype(np.float32)
    eps = rng.normal(0, 0.05, B).astype(np.float32)
    p2 = jnp.asarray(np.stack([phi, tau], axis=-1))
    p3 = jnp.asarray(np.stack([phi, np.ones_like(phi), tau], axis=-1))
    q2 = propagate.propagate_scan(p2, jnp.asarray(delta), jnp.asarray(eps))
    q3 = propagate.propagate_scan(p3, jnp.asarray(delta), jnp.asarray(eps))
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q3), atol=1e-6)


def test_su4_amp_matches_dense():
    sys_ = su4.TwoQubitSystem(xtalk=0.2, coupling=0.4)
    rng = np.random.default_rng(2)
    L = 4
    phi = rng.uniform(-np.pi, np.pi, L).astype(np.float32)
    omega = rng.uniform(0.0, 1.2, L).astype(np.float32)
    tau = rng.uniform(0.1, 0.4, L).astype(np.float32)
    pulses = jnp.asarray(np.stack([phi, omega, tau], axis=-1))[None]
    d1, d2, eps = 0.3, -0.2, 0.02

    Ur, Ui = su4.propagate_su4(pulses, jnp.asarray([d1]), jnp.asarray([d2]),
                               jnp.asarray([eps]), sys_)
    U = np.asarray(su4.complex_from_ri(Ur, Ui))[0]

    P = su4.pauli_strings()
    Uref = np.eye(4, dtype=np.complex64)
    for k in range(L):
        amp = 0.5 * (1 + eps) * omega[k]
        H = (amp * (np.cos(phi[k]) * P["X1"] + np.sin(phi[k]) * P["Y1"]
                    + sys_.xtalk * (np.cos(phi[k]) * P["X2"]
                                    + np.sin(phi[k]) * P["Y2"]))
             + 0.5 * (d1 * P["Z1"] + d2 * P["Z2"])
             + sys_.coupling * P["ZZ"])
        Uk = np.asarray(expm(jnp.asarray(-1j * H * tau[k], jnp.complex64)))
        Uref = Uk @ Uref
    np.testing.assert_allclose(U, Uref, atol=5e-6)


def test_grape_direct_three_param_space():
    from universal_quantum_optimal_control_tpu.models import (
        GRAPE,
        normalize_pulse_space,
    )

    model = GRAPE(num_pulses=6, direct=True,
                  pulse_space=normalize_pulse_space(
                      {"phi": (-3.15, 3.15), "omega": (0.0, 2.0),
                       "tau": (0.1, 0.5)}))
    rv = jnp.asarray([[1.0, 0.0, 0.0, np.pi]], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), rv)
    pulses = model.apply(params, rv)
    assert pulses.shape == (1, 6, 3)
    om = np.asarray(pulses[..., 1])
    assert np.all(om >= 0.0) and np.all(om <= 2.0)


@pytest.mark.slow
def test_amplitude_control_reaches_pure_zz_evolution():
    """A pure ZZ evolution (drive off for time T) is exactly expressible with
    Ω-control (Ω = 0 segments) and INEXPRESSIBLE with the reference's
    always-on unit drive — the reachability gap the 3-parameter space closes.

    (CZ itself remains a hard optimization landscape in both spaces —
    multi-start GRAPE plateaus ~0.75-0.84; tracked in ROADMAP.md.)"""
    sys_ = su4.TwoQubitSystem(xtalk=0.1, coupling=0.5)
    T = 1.2
    P = su4.pauli_strings()
    U_zz = np.asarray(expm(jnp.asarray(
        -1j * sys_.coupling * P["ZZ"] * T, jnp.complex64)))
    Tr_r = jnp.asarray(U_zz.real)[None]
    Tr_i = jnp.asarray(U_zz.imag)[None]

    # 3-param: drive off, 4 segments summing to T — exact by construction
    pulses3 = jnp.asarray(
        np.stack([np.zeros(4), np.zeros(4), np.full(4, T / 4)],
                 axis=-1, dtype=np.float32))[None]
    Ur, Ui = su4.propagate_su4(pulses3, jnp.zeros(1), jnp.zeros(1),
                               jnp.zeros(1), sys_)
    f3 = float(su4.fidelity_su4_ri(Ur, Ui, Tr_r, Tr_i)[0])
    assert f3 > 1 - 1e-5, f3

    # 2-param fixed drive: alternating phases can partially refocus the
    # always-on drive (best ≈ 0.998 over 64 random phase draws) but cannot
    # switch it off — the 3-param solution is EXACT, the 2-param one is not.
    rng = np.random.default_rng(0)
    best2 = 0.0
    for _ in range(64):
        phi = rng.uniform(-np.pi, np.pi, 4).astype(np.float32)
        pulses2 = jnp.asarray(
            np.stack([phi, np.full(4, T / 4, np.float32)], axis=-1))[None]
        Ur, Ui = su4.propagate_su4(pulses2, jnp.zeros(1), jnp.zeros(1),
                                   jnp.zeros(1), sys_)
        best2 = max(best2, float(su4.fidelity_su4_ri(Ur, Ui, Tr_r, Tr_i)[0]))
    assert best2 < 1 - 1e-4, best2
    assert f3 > best2


def test_su2_system_pallas_backend_amplitude_control():
    """The fused Pallas backend accepts the 3-parameter space end-to-end
    (round-2 hazard: it silently misread (φ,Ω,τ) tables as (φ,τ))."""
    from jax.experimental.pallas import tpu as pltpu

    from universal_quantum_optimal_control_tpu.training.systems import (
        SU2System,
    )

    rng = np.random.default_rng(5)
    B, L, M = 2, 6, 256
    pulses = jnp.asarray(np.stack(
        [rng.uniform(-np.pi, np.pi, (B, L)),
         rng.uniform(0.1, 1.5, (B, L)),
         rng.uniform(0.05, 0.5, (B, L))], axis=-1).astype(np.float32))
    q_t = su2.quat_normalize(jnp.asarray(
        rng.normal(size=(B, 4)).astype(np.float32)))
    errors = SU2System().sample_errors(jax.random.PRNGKey(0), (B, M), 1.0,
                                       0.05)
    with pltpu.force_tpu_interpret_mode():
        f_pallas = SU2System(backend="pallas").local_mean_fidelity(
            pulses, q_t, errors)
    f_xla = SU2System(backend="xla").local_mean_fidelity(pulses, q_t, errors)
    np.testing.assert_allclose(np.asarray(f_pallas), np.asarray(f_xla),
                               atol=1e-5)


def test_su4_pallas_backend_rejects_nondefault_expm_order():
    from universal_quantum_optimal_control_tpu.training.systems import (
        SU4System,
    )
    import pytest

    system = SU4System(backend="pallas")
    system.system = system.system._replace(expm_order=6)
    pulses = jnp.zeros((1, 2, 2))
    target = jnp.zeros((1, 2, 4, 4))
    errors = (jnp.zeros((1, 8)), jnp.zeros((1, 8)), jnp.zeros((1, 8)))
    with pytest.raises(NotImplementedError, match="expm"):
        system.local_mean_fidelity(pulses, target, errors)
