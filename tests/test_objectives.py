"""Fidelity/loss tests against hand-computed values and the complex forms."""

import jax
import jax.numpy as jnp
import numpy as np

from universal_quantum_optimal_control_tpu.core import objectives as obj
from universal_quantum_optimal_control_tpu.core import su2


def random_su2(key, n):
    return su2.quat_to_su2(su2.quat_normalize(jax.random.normal(key, (n, 4))))


def test_fidelity_normalizations_against_hand_values():
    I = jnp.eye(2, dtype=jnp.complex64)[None]
    X = jnp.array([[[0, 1], [1, 0]]], dtype=jnp.complex64)
    # identical unitaries: all fidelities are 1
    np.testing.assert_allclose(obj.entanglement_fidelity(I, I), [1.0], atol=1e-6)
    np.testing.assert_allclose(obj.trace_fidelity(I, I), [1.0], atol=1e-6)
    # dCRAB quirk: unsquared trace ⇒ maximum is (2+2)/6 = 2/3, not 1
    np.testing.assert_allclose(obj.dcrab_fidelity(I, I), [2 / 3], atol=1e-6)
    # orthogonal (Tr = 0): ent = d/(d(d+1)) = 1/3, trace = 0, dcrab = 1/3
    np.testing.assert_allclose(obj.entanglement_fidelity(I, X), [1 / 3], atol=1e-6)
    np.testing.assert_allclose(obj.trace_fidelity(I, X), [0.0], atol=1e-6)
    np.testing.assert_allclose(obj.dcrab_fidelity(I, X), [1 / 3], atol=1e-6)


def test_quaternion_fast_paths_match_complex():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    q1 = su2.quat_normalize(jax.random.normal(k1, (50, 4)))
    q2 = su2.quat_normalize(jax.random.normal(k2, (50, 4)))
    U1, U2 = su2.quat_to_su2(q1), su2.quat_to_su2(q2)
    np.testing.assert_allclose(
        obj.entanglement_fidelity_q(q1, q2), obj.entanglement_fidelity(U1, U2), atol=1e-5
    )
    np.testing.assert_allclose(
        obj.trace_fidelity_q(q1, q2), obj.trace_fidelity(U1, U2), atol=1e-5
    )


def test_losses_hand_computed():
    F = jnp.array(0.5)
    np.testing.assert_allclose(obj.negative_log_loss(F), -np.log(0.5), atol=1e-6)
    np.testing.assert_allclose(obj.infidelity_loss(F), 0.5, atol=1e-6)
    # sharp loss at F: log(1 + exp(-100*(F-0.99))) * (1-F)
    expect = np.log1p(np.exp(-100 * (0.5 - 0.99))) * 0.5
    np.testing.assert_allclose(obj.sharp_loss(F), expect, rtol=1e-5)
    # stable at extreme argument (naive exp would overflow)
    val = obj.sharp_loss(jnp.array(0.0))
    assert np.isfinite(val)
    np.testing.assert_allclose(val, 99.0, rtol=1e-4)  # softplus(99) * 1 ~ 99


def test_sharp_loss_gradient_finite_and_negative():
    g = jax.grad(obj.sharp_loss)(jnp.array(0.95))
    assert np.isfinite(g) and g < 0  # increasing fidelity lowers the loss
