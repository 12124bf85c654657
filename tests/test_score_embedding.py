"""SCORE embedding tests, including the YXY Euler property test (the
reference's only active test — test.py:123-192 — extended with gimbal-lock
cases and gradient checks)."""

import jax
import jax.numpy as jnp
import numpy as np

from universal_quantum_optimal_control_tpu.core import su2
from universal_quantum_optimal_control_tpu.models import score_embedding as se


def reconstruct_yxy(euler):
    """R_y(alpha) @ R_x(beta) @ R_y(gamma) as a quaternion."""
    ey = jnp.asarray([0.0, 1.0, 0.0])
    ex = jnp.asarray([1.0, 0.0, 0.0])
    qa = su2.axis_angle_to_quat(ey, euler[..., 0])
    qb = su2.axis_angle_to_quat(ex, euler[..., 1])
    qg = su2.axis_angle_to_quat(ey, euler[..., 2])
    return su2.quat_multiply(qa, su2.quat_multiply(qb, qg))


def trace_fid(q1, q2):
    t = su2.quat_trace_inner(q1, q2)
    return 0.25 * t * t


def test_euler_yxy_property_10k_random():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    n = jax.random.normal(k1, (10000, 3))
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    theta = jax.random.uniform(k2, (10000,), minval=0.0, maxval=2 * np.pi)
    rv = jnp.concatenate([n, theta[:, None]], axis=1)

    euler = se.euler_yxy_from_rotation_vector(rv)
    q_rec = reconstruct_yxy(euler)
    q_ref = su2.rotation_vector_to_quat(rv)
    F = trace_fid(q_rec, q_ref)
    # reference tolerance: fidelity >= 1 - 5e-3 (test.py:166-187)
    assert float(jnp.min(F)) >= 1 - 5e-3


def test_euler_yxy_gimbal_lock_cases():
    cases = jnp.asarray([
        [0.0, 1.0, 0.0, 1.3],        # pure Y rotation  (beta ~ 0)
        [1.0, 0.0, 0.0, np.pi],      # X(pi)            (beta ~ pi)
        [0.0, 0.0, 1.0, np.pi],      # Z(pi)            (beta ~ pi)
        [0.0, 1.0, 0.0, 0.0],        # identity
        [1.0, 0.0, 0.0, 1e-7],       # near-identity
    ], dtype=jnp.float32)
    euler = se.euler_yxy_from_rotation_vector(cases)
    assert np.all(np.isfinite(np.asarray(euler)))
    F = trace_fid(reconstruct_yxy(euler), su2.rotation_vector_to_quat(cases))
    np.testing.assert_array_less(1 - 5e-3, np.asarray(F) + 1e-7)


def test_euler_yxy_gradients_finite_everywhere():
    def f(rv):
        return jnp.sum(se.euler_yxy_from_rotation_vector(rv))

    for rv in ([0.0, 1.0, 0.0, 1.3], [1.0, 0.0, 0.0, np.pi],
               [0.3, 0.4, 0.5, 2.0], [0.0, 1.0, 0.0, 1e-8]):
        g = jax.grad(f)(jnp.asarray([rv], jnp.float32))
        assert np.all(np.isfinite(np.asarray(g))), rv


def test_score_triplet_composes_to_target_zero_error():
    """With the corrected middle convention the 3-pulse composite equals the
    ideal rotation at zero disorder."""
    phis = jnp.asarray([0.0, np.pi / 2, 1.1])
    angles = jnp.asarray([0.7, 2.0, np.pi / 2])
    trip = se.score_triplet(phis, angles, middle_convention="angle")  # (3, 3, 4)
    for i in range(3):
        q = trip[i, 0]
        for k in (1, 2):
            q = su2.quat_multiply(trip[i, k], q)
        axis = jnp.asarray([jnp.cos(phis[i]), jnp.sin(phis[i]), 0.0])
        q_ref = su2.axis_angle_to_quat(axis, angles[i])
        F = trace_fid(q, q_ref)
        assert float(F) > 1 - 1e-5, (i, float(F))


def test_score_embedding_shapes_and_phi_offset():
    rv = jnp.asarray([[0.0, 1.0, 0.0, 1.0], [1.0, 1.0, 0.0, 2.0]], jnp.float32)
    tokens, phi_off = se.score_features(rv)
    assert tokens.shape == (2, 9, 8)
    np.testing.assert_allclose(
        phi_off, [np.pi / 2, np.pi / 4], atol=1e-6
    )  # atan2(n_y, n_x)
    assert np.all(np.isfinite(np.asarray(tokens)))


def test_reference_middle_convention_also_works():
    rv = jnp.asarray([[0.3, 0.2, 0.9, 1.5]], jnp.float32)
    tokens_ref, _ = se.score_features(rv, middle_convention="reference")
    tokens_ang, _ = se.score_features(rv, middle_convention="angle")
    assert tokens_ref.shape == tokens_ang.shape
    # conventions genuinely differ
    assert float(jnp.max(jnp.abs(tokens_ref - tokens_ang))) > 1e-3


def test_positional_encoding_matches_standard_form():
    pe = se.sinusoidal_positional_encoding(9, 16)
    assert pe.shape == (9, 16)
    np.testing.assert_allclose(pe[0, 0::2], np.zeros(8), atol=1e-7)  # sin(0)
    np.testing.assert_allclose(pe[0, 1::2], np.ones(8), atol=1e-7)   # cos(0)
    np.testing.assert_allclose(pe[3, 0], np.sin(3.0), atol=1e-6)


def test_quat_to_real_vector_matches_complex_path():
    q = su2.quat_normalize(jax.random.normal(jax.random.PRNGKey(3), (50, 4)))
    direct = se.quat_to_real_vector(q)
    via_complex = se.to_real_vector(su2.quat_to_su2(q))
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via_complex),
                               atol=1e-6)


def test_yxy_theta_pi_branch_is_continuous_limit():
    """At θ = π with the axis in the xz-plane (H, tilted-axis π rotations —
    exactly the served named gates), the gimbal branch must emit the SAME
    (α, γ) split as the θ → π⁻ limit of the regular formulas; a different
    (equally valid) split reconstructs the unitary but produces SCORE tokens
    outside the training distribution (shipped d512 scored F≈0.40 on exact H
    before this convention was fixed)."""
    import math

    s2 = 1.0 / math.sqrt(2.0)
    for axis in ([s2, 0.0, s2], [0.5, 0.0, math.sqrt(3) / 2],
                 [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]):
        at_pi = jnp.asarray([axis + [math.pi]], jnp.float32)
        near_pi = jnp.asarray([axis + [math.pi - 1e-3]], jnp.float32)
        abg_pi = np.asarray(se.euler_yxy_from_rotation_vector(at_pi))[0]
        abg_near = np.asarray(se.euler_yxy_from_rotation_vector(near_pi))[0]
        np.testing.assert_allclose(abg_pi[0], abg_near[0], atol=5e-3)
        np.testing.assert_allclose(abg_pi[2], abg_near[2], atol=5e-3)
