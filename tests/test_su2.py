"""Unit tests for the quaternion SU(2) core against complex-matrix math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.linalg import expm

from universal_quantum_optimal_control_tpu.core import su2

I2 = np.eye(2, dtype=np.complex64)
SX = np.array([[0, 1], [1, 0]], dtype=np.complex64)
SY = np.array([[0, -1j], [1j, 0]], dtype=np.complex64)
SZ = np.array([[1, 0], [0, -1]], dtype=np.complex64)


def random_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return su2.quat_normalize(q)


def test_quat_to_su2_roundtrip():
    q = random_quats(jax.random.PRNGKey(0), 64)
    U = su2.quat_to_su2(q)
    # unitarity and det = 1
    UdU = np.einsum("bji,bjk->bik", np.conj(U), U)
    np.testing.assert_allclose(UdU, np.broadcast_to(I2, UdU.shape), atol=1e-6)
    det = U[:, 0, 0] * U[:, 1, 1] - U[:, 0, 1] * U[:, 1, 0]
    np.testing.assert_allclose(det, np.ones_like(det), atol=1e-6)
    q2 = su2.su2_to_quat(U)
    np.testing.assert_allclose(q, q2, atol=1e-6)


def test_quat_multiply_is_homomorphism():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    q1, q2 = random_quats(k1, 32), random_quats(k2, 32)
    lhs = su2.quat_to_su2(su2.quat_multiply(q1, q2))
    rhs = np.einsum("bij,bjk->bik", su2.quat_to_su2(q1), su2.quat_to_su2(q2))
    np.testing.assert_allclose(lhs, rhs, atol=1e-6)


def test_quat_conj_is_dagger():
    q = random_quats(jax.random.PRNGKey(2), 16)
    lhs = su2.quat_to_su2(su2.quat_conj(q))
    rhs = np.conj(np.swapaxes(su2.quat_to_su2(q), -1, -2))
    np.testing.assert_allclose(lhs, rhs, atol=1e-6)


def test_axis_angle_matches_expm():
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, (20, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    angle = jax.random.uniform(k2, (20,), minval=-6.0, maxval=6.0)
    U = su2.quat_to_su2(su2.axis_angle_to_quat(axis, angle))
    for i in range(20):
        n = np.asarray(axis[i])
        H = 0.5 * float(angle[i]) * (n[0] * SX + n[1] * SY + n[2] * SZ)
        U_ref = expm(-1j * jnp.asarray(H, dtype=jnp.complex64))
        np.testing.assert_allclose(U[i], U_ref, atol=2e-5)


def test_axis_angle_zero_angle_is_identity_and_grad_finite():
    axis = jnp.array([1.0, 0.0, 0.0])
    q = su2.axis_angle_to_quat(axis, jnp.array(0.0))
    np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-7)

    g = jax.grad(lambda a: su2.axis_angle_to_quat(axis, a)[1])(0.0)
    assert np.isfinite(g)


def test_segment_quat_matches_reference_hamiltonian():
    """U = expm(-i * 0.5*(1+eps)*(cos phi X + sin phi Y + delta Z) * tau)."""
    rng = np.random.default_rng(0)
    for _ in range(10):
        phi, tau = rng.uniform(-np.pi, np.pi), rng.uniform(0.01, 2.0)
        delta, eps = rng.normal(), rng.normal() * 0.05
        q = su2.segment_quat(jnp.float32(phi), jnp.float32(tau),
                             jnp.float32(delta), jnp.float32(eps))
        H = 0.5 * (1 + eps) * (np.cos(phi) * SX + np.sin(phi) * SY + delta * SZ)
        U_ref = expm(jnp.asarray(-1j * H * tau, dtype=jnp.complex64))
        np.testing.assert_allclose(su2.quat_to_su2(q), U_ref, atol=2e-5)


def test_trace_inner_and_fidelity():
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    q1, q2 = random_quats(k1, 32), random_quats(k2, 32)
    U1, U2 = su2.quat_to_su2(q1), su2.quat_to_su2(q2)
    tr = np.einsum("bji,bji->b", np.conj(U1), U2)
    np.testing.assert_allclose(su2.quat_trace_inner(q1, q2), np.real(tr), atol=1e-5)
    F_ref = (np.abs(tr) ** 2 + 2) / 6
    np.testing.assert_allclose(su2.quat_fidelity(q1, q2), F_ref, atol=1e-5)
    # fidelity of a unitary with itself is 1
    np.testing.assert_allclose(su2.quat_fidelity(q1, q1), np.ones(32), atol=1e-6)


def test_rotation_vector_to_quat_normalizes_axis():
    rv = jnp.array([[2.0, 0.0, 0.0, np.pi]])  # unnormalized axis
    q = su2.rotation_vector_to_quat(rv)
    np.testing.assert_allclose(q[0], [np.cos(np.pi / 2), 1.0, 0.0, 0.0], atol=1e-6)
