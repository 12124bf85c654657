"""Physics invariants of the propagator — properties that must hold for ANY
correct implementation (independent of the reference)."""

import jax
import jax.numpy as jnp
import numpy as np

from universal_quantum_optimal_control_tpu.core import propagate, su2


def make_pulses(B=6, L=9, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    phi = jax.random.uniform(k1, (B, L), minval=-np.pi, maxval=np.pi)
    tau = jax.random.uniform(k2, (B, L), minval=0.05, maxval=0.5)
    return jnp.stack([phi, tau], axis=-1)


def test_unitarity_preserved():
    pulses = make_pulses()
    delta = jnp.linspace(-2, 2, 6)
    eps = jnp.linspace(-0.1, 0.1, 6)
    q = propagate.propagate_scan(pulses, delta, eps)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1),
                               np.ones(6), atol=1e-5)


def test_phase_shift_equivariance():
    """Shifting every pulse phase by α conjugates the propagator by Rz(α):
    U(φ+α) = Rz(α) U(φ) Rz(α)† — because Z commutes with the δ·Z disorder
    term.  This is the symmetry behind the model's φ-offset trick."""
    pulses = make_pulses(seed=1)
    delta = jnp.asarray([0.3, -0.7, 0.0, 1.2, -0.2, 0.5])
    eps = jnp.asarray([0.02, -0.05, 0.0, 0.01, 0.04, -0.03])
    alpha = 0.83

    q1 = propagate.propagate_scan(pulses, delta, eps)
    shifted = pulses.at[..., 0].add(alpha)
    q2 = propagate.propagate_scan(shifted, delta, eps)

    rz = su2.axis_angle_to_quat(jnp.asarray([0.0, 0.0, 1.0]),
                                jnp.asarray(alpha))
    expect = su2.quat_multiply(rz, su2.quat_multiply(q1, su2.quat_conj(rz)))
    np.testing.assert_allclose(np.asarray(q2), np.asarray(expect), atol=1e-5)


def test_time_reversal_inverse():
    """Reversing the segment order with φ → φ+π and δ → −δ yields exactly the
    inverse propagator: −H(φ, δ) = H(φ+π, −δ), so every reversed segment is
    the original's adjoint and the reversed product is U†."""
    pulses = make_pulses(B=4, seed=2)
    delta = jnp.asarray([0.4, -0.3, 0.9, 0.0])
    eps = jnp.asarray([0.05, -0.02, 0.0, 0.03])

    q = propagate.propagate_scan(pulses, delta, eps)
    reversed_pulses = pulses[:, ::-1, :].at[..., 0].add(jnp.pi)
    q_rev = propagate.propagate_scan(reversed_pulses, -delta, eps)

    np.testing.assert_allclose(np.asarray(q_rev),
                               np.asarray(su2.quat_conj(q)), atol=1e-5)


def test_segment_splitting_invariance():
    """Splitting a segment into two half-duration segments with the same φ
    leaves the propagator unchanged (piecewise-constant semantics)."""
    pulses = make_pulses(B=3, L=4, seed=3)
    delta = jnp.asarray([0.2, -0.5, 1.0])
    eps = jnp.asarray([0.01, 0.0, -0.04])
    q = propagate.propagate_scan(pulses, delta, eps)

    # split each segment in half -> (B, 2L, 2)
    phi = jnp.repeat(pulses[..., 0], 2, axis=1)
    tau = jnp.repeat(pulses[..., 1] / 2.0, 2, axis=1)
    split = jnp.stack([phi, tau], axis=-1)
    q_split = propagate.propagate_scan(split, delta, eps)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_split), atol=1e-5)


def test_scaling_property_epsilon_vs_tau():
    """ε enters only as a (1+ε) factor on all durations:
    U(τ, ε) == U(τ·(1+ε), 0)."""
    pulses = make_pulses(B=3, L=5, seed=4)
    delta = jnp.asarray([0.3, -0.2, 0.8])
    eps = jnp.asarray([0.07, -0.04, 0.12])
    q1 = propagate.propagate_scan(pulses, delta, eps)
    scaled = pulses.at[..., 1].multiply((1.0 + eps)[:, None])
    q2 = propagate.propagate_scan(scaled, delta, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)


def test_fidelity_invariant_under_global_unitary():
    """Entanglement fidelity is invariant under simultaneous left-multiplication
    of both arguments."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    q1 = su2.quat_normalize(jax.random.normal(k1, (16, 4)))
    q2 = su2.quat_normalize(jax.random.normal(k2, (16, 4)))
    w = su2.quat_normalize(jax.random.normal(k3, (4,)))
    f0 = su2.quat_fidelity(q1, q2)
    f1 = su2.quat_fidelity(su2.quat_multiply(w, q1), su2.quat_multiply(w, q2))
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-5)
