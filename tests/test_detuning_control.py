"""4-parameter (φ, Ω, Δ, τ) pulse-space tests — the reference's full
declared single-qubit space (test.py:16-18: ``{"Delta", "Omega", "phi",
"tau"}``; interface universal_model.py:31, 47-51).  The reference's
generator asserts P = 2 and never implements it; here the detuning Δ is a
first-class control on the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.linalg import expm

from universal_quantum_optimal_control_tpu.core import propagate, su2
from universal_quantum_optimal_control_tpu.models import (
    UniversalQOCTransformer, normalize_pulse_space)

SX = np.array([[0, 1], [1, 0]], dtype=np.complex64)
SY = np.array([[0, -1j], [1j, 0]], dtype=np.complex64)
SZ = np.array([[1, 0], [0, -1]], dtype=np.complex64)


def test_su2_detuned_propagator_matches_dense():
    rng = np.random.default_rng(0)
    B, L = 4, 7
    phi = rng.uniform(-np.pi, np.pi, (B, L)).astype(np.float32)
    omega = rng.uniform(0.0, 1.5, (B, L)).astype(np.float32)
    det = rng.uniform(-5.0, 5.0, (B, L)).astype(np.float32)
    tau = rng.uniform(0.05, 0.5, (B, L)).astype(np.float32)
    pulses = np.stack([phi, omega, det, tau], axis=-1)
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
                + (det[b, k] + delta[b]) * SZ)
            Uk = np.asarray(expm(jnp.asarray(-1j * H * tau[b, k],
                                             jnp.complex64)))
            Uref = Uk @ Uref
        np.testing.assert_allclose(U[b], Uref, atol=2e-5)


def test_delta_zero_reduces_to_three_param():
    rng = np.random.default_rng(1)
    B, L = 3, 5
    phi = rng.uniform(-np.pi, np.pi, (B, L)).astype(np.float32)
    omega = rng.uniform(0.0, 1.0, (B, L)).astype(np.float32)
    tau = rng.uniform(0.05, 0.5, (B, L)).astype(np.float32)
    delta = rng.normal(0, 0.5, B).astype(np.float32)
    eps = rng.normal(0, 0.05, B).astype(np.float32)
    p3 = jnp.asarray(np.stack([phi, omega, tau], axis=-1))
    p4 = jnp.asarray(np.stack([phi, omega, np.zeros_like(phi), tau],
                              axis=-1))
    q3 = propagate.propagate_scan(p3, jnp.asarray(delta), jnp.asarray(eps))
    q4 = propagate.propagate_scan(p4, jnp.asarray(delta), jnp.asarray(eps))
    np.testing.assert_allclose(np.asarray(q3), np.asarray(q4), atol=1e-6)


def test_pure_detuning_is_z_rotation():
    """Ω = 0, Δ = d segments rotate about Z by (d + δ)·τ — the detuning
    axis the 2- and 3-parameter spaces cannot drive independently."""
    pulses = jnp.asarray([[[0.3, 0.0, 2.0, 0.7]]])  # phi, omega=0, det, tau
    delta = jnp.asarray([0.5])
    q = propagate.propagate_scan(pulses, delta, jnp.zeros(1))
    expect = su2.axis_angle_to_quat(jnp.asarray([0.0, 0.0, 1.0]),
                                    jnp.asarray((2.0 + 0.5) * 0.7))
    np.testing.assert_allclose(np.asarray(q[0]), np.asarray(expect),
                               atol=1e-6)


def test_reference_declaration_order_canonicalizes():
    """The reference's literal dict (test.py:16-18) maps onto the
    propagator's (φ, Ω, Δ, τ) channel order regardless of key order."""
    ref_decl = {"Delta": (-5, 5), "Omega": (0, 1),
                "phi": (-np.pi, np.pi), "tau": (0, 1.0)}
    space = normalize_pulse_space(ref_decl)
    assert [k for k, _ in space] == ["phi", "Omega", "Delta", "tau"]
    # existing declarations keep their order
    assert [k for k, _ in normalize_pulse_space(
        {"phi": (-3.15, 3.15), "tau": (0.1, 0.5)})] == ["phi", "tau"]
    assert [k for k, _ in normalize_pulse_space(
        {"phi1": (-3, 3), "phi2": (-3, 3), "omega": (0, 1),
         "tau": (0.1, 0.5)})] == ["phi1", "phi2", "omega", "tau"]
    # unknown keys: declaration order preserved
    assert [k for k, _ in normalize_pulse_space(
        {"b": (0, 1), "a": (0, 1)})] == ["b", "a"]


def test_model_emits_four_param_pulses_and_grads_flow():
    model = UniversalQOCTransformer(
        pulse_space=normalize_pulse_space(
            {"Delta": (-5, 5), "Omega": (0, 1),
             "phi": (-np.pi, np.pi), "tau": (0, 1.0)}),
        max_pulses=6, d_model=32, n_layers=2, n_heads=4,
        dtype=jnp.float32)
    rv = jnp.asarray([[1.0, 0.0, 0.0, np.pi], [0.0, 0.0, 1.0, 0.5]],
                     jnp.float32)
    params = model.init(jax.random.PRNGKey(0), rv)
    pulses = model.apply(params, rv)
    assert pulses.shape == (2, 6, 4)
    phi, om, det, tau = (np.asarray(pulses[..., i]) for i in range(4))
    assert (np.abs(phi) <= np.pi + 1e-6).all()
    assert ((om >= 0) & (om <= 1)).all()
    assert ((det >= -5) & (det <= 5)).all()
    assert (tau >= 0).all()

    def loss(p):
        pl = model.apply(p, rv)
        q = propagate.propagate_scan(pl, jnp.zeros(2), jnp.zeros(2))
        return -jnp.mean(q[..., 0])

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.abs(x).sum())
                for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def _rand_p4(key, B=2, L=5, M=128):
    ks = jax.random.split(key, 6)
    phi = jax.random.uniform(ks[0], (B, L), minval=-np.pi, maxval=np.pi)
    om = jax.random.uniform(ks[1], (B, L), minval=0.0, maxval=1.2)
    det = jax.random.uniform(ks[2], (B, L), minval=-3.0, maxval=3.0)
    tau = jax.random.uniform(ks[3], (B, L), minval=0.05, maxval=0.5)
    pulses = jnp.stack([phi, om, det, tau], axis=-1)
    delta = 0.5 * jax.random.normal(ks[4], (B, M))
    eps = 0.05 * jax.random.normal(ks[5], (B, M))
    return pulses, delta, eps


def test_pallas_forward_four_param_matches_xla():
    from universal_quantum_optimal_control_tpu.ops.propagate_pallas import (
        propagate_mc_pallas)
    pulses, delta, eps = _rand_p4(jax.random.PRNGKey(0))
    q_k = propagate_mc_pallas(pulses, delta, eps)
    q_x = propagate.propagate_mc(pulses, delta, eps)
    np.testing.assert_allclose(np.asarray(q_k), np.asarray(q_x), atol=2e-5)


@pytest.mark.slow
def test_pallas_fused_objective_four_param_grads_match_xla():
    from universal_quantum_optimal_control_tpu.ops.propagate_pallas import (
        mean_fidelity_pallas)
    from universal_quantum_optimal_control_tpu.core.su2 import quat_fidelity

    pulses, delta, eps = _rand_p4(jax.random.PRNGKey(1), B=2, L=4, M=128)
    qt = su2.axis_angle_to_quat(
        jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]]),
        jnp.asarray([0.7, 2.1]))

    def obj_k(p):
        return jnp.sum(mean_fidelity_pallas(p, qt, delta, eps))

    def obj_x(p):
        q = propagate.propagate_mc(p, delta, eps)
        return jnp.sum(jnp.mean(quat_fidelity(q, qt[:, None, :]), axis=1))

    vk, gk = jax.value_and_grad(obj_k)(pulses)
    vx, gx = jax.value_and_grad(obj_x)(pulses)
    np.testing.assert_allclose(float(vk), float(vx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                               atol=1e-4, rtol=1e-4)
