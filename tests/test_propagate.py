"""Propagator tests: all reduction strategies agree, and agree with the
reference algorithm (complex matrix_exp + matmul chain) re-derived here."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import expm

from universal_quantum_optimal_control_tpu.core import propagate, su2

SX = np.array([[0, 1], [1, 0]], dtype=np.complex64)
SY = np.array([[0, -1j], [1j, 0]], dtype=np.complex64)
SZ = np.array([[1, 0], [0, -1]], dtype=np.complex64)


def reference_propagator(pulses, delta, eps):
    """Dense complex oracle: U_out = U_L ... U_1 with
    U_k = expm(-i * 0.5*(1+eps)*(cos phi_k X + sin phi_k Y + delta Z) * tau_k).
    (Same math as reference SCORE.py:117-142, independently written.)"""
    B, L, _ = pulses.shape
    out = np.empty((B, 2, 2), dtype=np.complex64)
    for b in range(B):
        U = np.eye(2, dtype=np.complex64)
        for k in range(L):
            phi, tau = float(pulses[b, k, 0]), float(pulses[b, k, 1])
            H = 0.5 * (1 + float(eps[b])) * (
                np.cos(phi) * SX + np.sin(phi) * SY + float(delta[b]) * SZ
            )
            U = np.asarray(expm(jnp.asarray(-1j * H * tau, jnp.complex64))) @ U
        out[b] = U
    return out


def make_inputs(B=8, L=13, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    phi = jax.random.uniform(k1, (B, L), minval=-np.pi, maxval=np.pi)
    tau = jax.random.uniform(k2, (B, L), minval=0.05, maxval=0.5)
    pulses = jnp.stack([phi, tau], axis=-1)
    delta = jax.random.normal(k3, (B,))
    eps = jax.random.normal(k4, (B,)) * 0.05
    return pulses, delta, eps


def test_propagators_match_dense_oracle():
    pulses, delta, eps = make_inputs()
    U_ref = reference_propagator(np.asarray(pulses), np.asarray(delta), np.asarray(eps))
    for method in ("scan", "assoc", "unrolled"):
        U = propagate.unitary_generator(pulses, jnp.stack([delta, eps]), method=method)
        np.testing.assert_allclose(np.asarray(U), U_ref, atol=1e-4)


def test_reduction_strategies_agree_tightly():
    pulses, delta, eps = make_inputs(B=32, L=40, seed=1)
    qs = propagate.propagate_scan(pulses, delta, eps)
    qa = propagate.propagate_assoc(pulses, delta, eps)
    qu = propagate.propagate_unrolled(pulses, delta, eps)
    np.testing.assert_allclose(qs, qa, atol=1e-5)
    np.testing.assert_allclose(qs, qu, atol=1e-5)


def test_propagate_mc_equals_explicit_repeat():
    pulses, _, _ = make_inputs(B=4, L=10, seed=2)
    key = jax.random.PRNGKey(3)
    delta = jax.random.normal(key, (4, 16))
    eps = jax.random.normal(jax.random.PRNGKey(4), (4, 16)) * 0.05
    q_mc = propagate.propagate_mc(pulses, delta, eps)  # (4, 16, 4)
    # explicit repeat_interleave-style reference
    pulses_rep = jnp.repeat(pulses, 16, axis=0)
    q_flat = propagate.propagate_scan(pulses_rep, delta.reshape(-1), eps.reshape(-1))
    np.testing.assert_allclose(q_mc.reshape(-1, 4), q_flat, atol=1e-6)


def test_zero_error_identity_pulse_composes_to_target():
    """A single segment phi=0, tau=theta at zero disorder must equal X(theta)
    rotation: exp(-i theta/2 X)."""
    theta = 1.3
    pulses = jnp.array([[[0.0, theta]]])
    q = propagate.propagate_scan(pulses, jnp.zeros(1), jnp.zeros(1))
    expect = su2.axis_angle_to_quat(jnp.array([1.0, 0.0, 0.0]), jnp.array(theta))
    np.testing.assert_allclose(q[0], expect, atol=1e-6)


def test_gradients_flow_and_are_correct():
    pulses, delta, eps = make_inputs(B=2, L=6, seed=5)
    target = su2.axis_angle_to_quat(jnp.array([1.0, 0.0, 0.0]), jnp.array(np.pi))

    def loss(p, method):
        fn = {"scan": propagate.propagate_scan,
              "assoc": propagate.propagate_assoc,
              "unrolled": propagate.propagate_unrolled}[method]
        q = fn(p, delta, eps)
        return 1.0 - jnp.mean(su2.quat_fidelity(q, target))

    g_scan = jax.grad(lambda p: loss(p, "scan"))(pulses)
    g_assoc = jax.grad(lambda p: loss(p, "assoc"))(pulses)
    g_unr = jax.grad(lambda p: loss(p, "unrolled"))(pulses)
    assert np.all(np.isfinite(g_scan))
    assert float(jnp.max(jnp.abs(g_scan))) > 0
    np.testing.assert_allclose(g_scan, g_assoc, atol=1e-5)
    np.testing.assert_allclose(g_scan, g_unr, atol=1e-5)

    # finite-difference check on one coordinate
    e = jnp.zeros_like(pulses).at[0, 0, 0].set(1.0)
    h = 1e-3
    fd = (loss(pulses + h * e, "scan") - loss(pulses - h * e, "scan")) / (2 * h)
    np.testing.assert_allclose(g_scan[0, 0, 0], fd, atol=1e-3)


def test_scan_remat_matches_scan_values_and_grads():
    from universal_quantum_optimal_control_tpu.core.propagate import (
        propagate_scan,
        propagate_scan_remat,
    )
    pulses, delta, eps = make_inputs(B=4, L=23, seed=9)  # non-square L
    q_a = propagate_scan(pulses, delta, eps)
    q_b = propagate_scan_remat(pulses, delta, eps)
    np.testing.assert_allclose(np.asarray(q_a), np.asarray(q_b), atol=1e-6)

    target = su2.axis_angle_to_quat(jnp.array([1.0, 0.0, 0.0]),
                                    jnp.array(np.pi))

    def loss(fn, p):
        return 1.0 - jnp.mean(su2.quat_fidelity(fn(p, delta, eps), target))

    g_a = jax.grad(lambda p: loss(propagate_scan, p))(pulses)
    g_b = jax.grad(lambda p: loss(propagate_scan_remat, p))(pulses)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b), atol=1e-5)
