"""Pallas propagator kernel vs the XLA reference path (interpret mode on CPU)."""

import pytest

# interpret-mode kernel compiles dominate the CPU suite wall-clock;
# run with the full tier (see README §Testing): pytest -m "" tests/
pytestmark = pytest.mark.slow


import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from universal_quantum_optimal_control_tpu.core import propagate as xla_prop
from universal_quantum_optimal_control_tpu.core import su2
from universal_quantum_optimal_control_tpu.ops import propagate_pallas as pk


def make_inputs(B=3, L=20, M=256, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    phi = jax.random.uniform(k1, (B, L), minval=-np.pi, maxval=np.pi)
    tau = jax.random.uniform(k2, (B, L), minval=0.05, maxval=0.5)
    pulses = jnp.stack([phi, tau], axis=-1)
    delta = jax.random.normal(k3, (B, M))
    eps = jax.random.normal(k4, (B, M)) * 0.05
    return pulses, delta, eps


@pytest.fixture(autouse=True)
def _interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_propagate_mc_pallas_matches_xla():
    pulses, delta, eps = make_inputs()
    q_pallas = pk.propagate_mc_pallas(pulses, delta, eps)
    q_xla = xla_prop.propagate_mc(pulses, delta, eps)
    np.testing.assert_allclose(np.asarray(q_pallas), np.asarray(q_xla), atol=1e-5)


def test_mean_fidelity_pallas_matches_xla():
    pulses, delta, eps = make_inputs(B=2, M=256, seed=1)
    q_t = su2.quat_normalize(jax.random.normal(jax.random.PRNGKey(7), (2, 4)))
    f_pallas = pk.mean_fidelity_pallas(pulses, q_t, delta, eps)
    q = xla_prop.propagate_mc(pulses, delta, eps)
    f_xla = jnp.mean(su2.quat_fidelity(q, q_t[:, None, :]), axis=1)
    np.testing.assert_allclose(np.asarray(f_pallas), np.asarray(f_xla), atol=1e-5)


def test_pallas_gradients_match_xla():
    pulses, delta, eps = make_inputs(B=2, L=8, M=128, seed=2)
    q_t = su2.quat_normalize(jax.random.normal(jax.random.PRNGKey(9), (2, 4)))

    def loss_pallas(p):
        return 1.0 - jnp.mean(pk.mean_fidelity_pallas(p, q_t, delta, eps))

    def loss_xla(p):
        q = xla_prop.propagate_mc(p, delta, eps)
        return 1.0 - jnp.mean(su2.quat_fidelity(q, q_t[:, None, :]))

    g_p = jax.grad(loss_pallas)(pulses)
    g_x = jax.grad(loss_xla)(pulses)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=1e-5)


def test_uneven_mc_rows_tile():
    # rows = M/128 = 3 not divisible by default tile → tile shrink path
    pulses, delta, eps = make_inputs(B=2, L=5, M=384, seed=3)
    q_pallas = pk.propagate_mc_pallas(pulses, delta, eps)
    q_xla = xla_prop.propagate_mc(pulses, delta, eps)
    np.testing.assert_allclose(np.asarray(q_pallas), np.asarray(q_xla), atol=1e-5)


def test_odd_row_count_mc_is_padded_to_tile_multiple():
    """rows = M/128 odd and > 8 (e.g. the finetune CLI's 200k-MC eval →
    1563 rows) previously shrank the tile to an unlowerable (1, 128) block;
    `_pad_mc` now rounds rows beyond one native tile up to a multiple of 8
    and the kernels mask the padding out of the mean exactly."""
    pulses, delta, eps = make_inputs(B=2, L=5, M=1280, seed=9)  # rows = 10
    q_t = su2.quat_normalize(jax.random.normal(jax.random.PRNGKey(5), (2, 4)))

    f_pallas = pk.mean_fidelity_pallas(pulses, q_t, delta, eps)
    q_xla = xla_prop.propagate_mc(pulses, delta, eps)
    f_xla = jnp.mean(su2.quat_fidelity(q_xla, q_t[:, None, :]), axis=1)
    np.testing.assert_allclose(np.asarray(f_pallas), np.asarray(f_xla),
                               atol=1e-5)

    q_pallas = pk.propagate_mc_pallas(pulses, delta, eps)
    assert q_pallas.shape == (2, 1280, 4)
    np.testing.assert_allclose(np.asarray(q_pallas), np.asarray(q_xla),
                               atol=1e-5)


def test_unaligned_mc_is_padded_exactly():
    """M not a multiple of 128 (e.g. the workload CLIs' --monte_carlo 1000
    default) is zero-padded inside the wrappers and sliced/masked back out —
    results identical to the XLA path at the true M."""
    pulses, delta, eps = make_inputs(B=2, L=6, M=256)
    delta, eps = delta[:, :100], eps[:, :100]

    q_pallas = pk.propagate_mc_pallas(pulses, delta, eps)
    q_xla = xla_prop.propagate_mc(pulses, delta, eps)
    assert q_pallas.shape == (2, 100, 4)
    np.testing.assert_allclose(np.asarray(q_pallas), np.asarray(q_xla),
                               atol=1e-5)

    q_t = su2.quat_normalize(jax.random.normal(jax.random.PRNGKey(3), (2, 4)))
    f_pallas = pk.mean_fidelity_pallas(pulses, q_t, delta, eps)
    f_xla = jnp.mean(su2.quat_fidelity(q_xla, q_t[:, None, :]), axis=1)
    np.testing.assert_allclose(np.asarray(f_pallas), np.asarray(f_xla),
                               atol=1e-5)


def test_unaligned_mc_gradients_match_xla():
    pulses, delta, eps = make_inputs(B=2, L=5, M=256, seed=7)
    delta, eps = delta[:, :200], eps[:, :200]
    q_t = su2.quat_normalize(jax.random.normal(jax.random.PRNGKey(4), (2, 4)))

    def obj_pallas(p, d, e):
        return jnp.sum(pk.mean_fidelity_pallas(p, q_t, d, e))

    def obj_xla(p, d, e):
        q = xla_prop.propagate_mc(p, d, e)
        return jnp.sum(jnp.mean(su2.quat_fidelity(q, q_t[:, None, :]), axis=1))

    g_p = jax.grad(obj_pallas, argnums=(0, 1, 2))(pulses, delta, eps)
    g_x = jax.grad(obj_xla, argnums=(0, 1, 2))(pulses, delta, eps)
    for a, b in zip(g_p, g_x):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_bwd_kernel_matches_xla_vjp():
    """The fused reverse-sweep kernel's cotangents (pulses, delta, eps) match
    the XLA scan VJP exactly."""
    from universal_quantum_optimal_control_tpu.ops.propagate_pallas_bwd import (
        propagate_mc_vjp_pallas,
    )

    pulses, delta, eps = make_inputs(B=3, L=11, M=256, seed=4)
    g = jax.random.normal(jax.random.PRNGKey(5), (3, 256, 4))

    dp_p, dd_p, de_p = propagate_mc_vjp_pallas(pulses, delta, eps, g)
    _, vjp = jax.vjp(
        lambda p, d, e: xla_prop.propagate_mc(p, d, e), pulses, delta, eps)
    dp_x, dd_x, de_x = vjp(g)
    np.testing.assert_allclose(np.asarray(dp_p), np.asarray(dp_x),
                               rtol=1e-4, atol=1e-4)
    # atol covers near-zero entries; rtol covers O(1)+ entries where f32
    # accumulation noise vs libm exceeds a pure 1e-5 absolute budget
    np.testing.assert_allclose(np.asarray(dd_p), np.asarray(dd_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(de_p), np.asarray(de_x),
                               rtol=1e-4, atol=1e-5)


def test_mean_fidelity_pallas_full_gradient_chain():
    """grad through mean_fidelity_pallas (fwd + fused bwd kernels) matches
    the pure XLA objective for all four inputs."""
    pulses, delta, eps = make_inputs(B=2, L=9, M=128, seed=6)
    q_t = su2.quat_normalize(jax.random.normal(jax.random.PRNGKey(8), (2, 4)))

    def obj_pallas(p, qt, d, e):
        return jnp.sum(pk.mean_fidelity_pallas(p, qt, d, e))

    def obj_xla(p, qt, d, e):
        q = xla_prop.propagate_mc(p, d, e)
        return jnp.sum(jnp.mean(su2.quat_fidelity(q, qt[:, None, :]), axis=1))

    g_p = jax.grad(obj_pallas, argnums=(0, 1, 2, 3))(pulses, q_t, delta, eps)
    g_x = jax.grad(obj_xla, argnums=(0, 1, 2, 3))(pulses, q_t, delta, eps)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_poly_sincos_variant_matches_native():
    """The fused polynomial sincos path (UQOC_SINCOS=poly) must agree with
    the libm path to <1e-5 across the full disorder range, including tail
    samples that cross the pi/2 reduction boundary."""
    pulses, delta, eps = make_inputs(B=2, L=20, M=256, seed=11)
    delta = delta * 3.0  # tail samples: half-angle up to ~0.8*pi
    q_native = pk._propagate_mc_pallas_raw(pulses, delta, eps,
                                           sincos="native")
    q_poly = pk._propagate_mc_pallas_raw(pulses, delta, eps, sincos="poly")
    np.testing.assert_allclose(np.asarray(q_poly), np.asarray(q_native),
                               atol=1e-5)

    q_t = su2.quat_normalize(jax.random.normal(jax.random.PRNGKey(2), (2, 4)))
    f_native = pk._mean_fid_raw(pulses, q_t, delta, eps, sincos="native")
    f_poly = pk._mean_fid_raw(pulses, q_t, delta, eps, sincos="poly")
    np.testing.assert_allclose(np.asarray(f_poly), np.asarray(f_native),
                               atol=1e-5)


def test_poly_sincos_primitive_accuracy():
    """_sincos_poly vs numpy over a wide range (several reduction periods)."""
    x = jnp.asarray(np.linspace(-12.0, 12.0, 20001), jnp.float32)
    s, c = pk._sincos_poly(x)
    np.testing.assert_allclose(np.asarray(s), np.sin(np.asarray(x)),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(c), np.cos(np.asarray(x)),
                               atol=2e-6)


def test_poly_fast_sincos_primitive_accuracy():
    """The deg-7/6 lever pair (sincos="poly_fast") holds the 1e-5 contract."""
    x = jnp.asarray(np.linspace(-12.0, 12.0, 20001), jnp.float32)
    s, c = pk._sincos_poly(x, fast=True)
    np.testing.assert_allclose(np.asarray(s), np.sin(np.asarray(x)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), np.cos(np.asarray(x)),
                               atol=1e-5)


def test_lever_variants_match_default():
    """The round-3 lever knobs — sincos="poly_fast" (deg-7/6 minimax) and
    schedule="paired" (pair-product composition, benchmarks/su2_fwd_levers.py)
    — must reproduce the default path: paired exactly (same ops, different
    association order ⇒ f32 rounding only), poly_fast to its 1e-5 poly
    error."""
    pulses, delta, eps = make_inputs(B=2, L=9, M=256, seed=13)  # odd L
    delta = delta * 3.0
    q_t = su2.quat_normalize(jax.random.normal(jax.random.PRNGKey(2), (2, 4)))
    f_def = pk._mean_fid_raw(pulses, q_t, delta, eps)
    for kw in ({"sincos": "poly_fast"}, {"schedule": "paired"},
               {"sincos": "poly_fast", "schedule": "paired"}):
        f = pk._mean_fid_raw(pulses, q_t, delta, eps, **kw)
        np.testing.assert_allclose(np.asarray(f), np.asarray(f_def),
                                   atol=2e-5, err_msg=str(kw))
    q_def = pk._propagate_mc_pallas_raw(pulses, delta, eps)
    q_pair = pk._propagate_mc_pallas_raw(pulses, delta, eps,
                                         schedule="paired")
    np.testing.assert_allclose(np.asarray(q_pair), np.asarray(q_def),
                               atol=1e-6)


# ---- 3-parameter (phi, Omega, tau) amplitude-modulated pulse space --------

def make_amp_inputs(B=3, L=12, M=256, seed=11, omega_min=0.1):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    phi = jax.random.uniform(k1, (B, L), minval=-np.pi, maxval=np.pi)
    omega = jax.random.uniform(k2, (B, L), minval=omega_min, maxval=1.8)
    tau = jax.random.uniform(k3, (B, L), minval=0.05, maxval=0.5)
    pulses = jnp.stack([phi, omega, tau], axis=-1)
    delta = jax.random.normal(k4, (B, M))
    eps = jax.random.normal(k5, (B, M)) * 0.05
    return pulses, delta, eps


def test_amp_propagate_mc_pallas_matches_xla():
    pulses, delta, eps = make_amp_inputs()
    q_pallas = pk.propagate_mc_pallas(pulses, delta, eps)
    q_xla = xla_prop.propagate_mc(pulses, delta, eps)
    np.testing.assert_allclose(np.asarray(q_pallas), np.asarray(q_xla),
                               atol=1e-5)


def test_amp_mean_fidelity_pallas_matches_xla():
    pulses, delta, eps = make_amp_inputs(B=2, seed=12)
    q_t = su2.quat_normalize(jax.random.normal(jax.random.PRNGKey(7), (2, 4)))
    f_pallas = pk.mean_fidelity_pallas(pulses, q_t, delta, eps)
    q = xla_prop.propagate_mc(pulses, delta, eps)
    f_xla = jnp.mean(su2.quat_fidelity(q, q_t[:, None, :]), axis=1)
    np.testing.assert_allclose(np.asarray(f_pallas), np.asarray(f_xla),
                               atol=1e-5)


def test_amp_omega_zero_segment_matches_xla():
    """Ω = 0 (free-evolution) segments exercise the clamped-norm guard."""
    pulses, delta, eps = make_amp_inputs(B=2, L=6, M=128, seed=13)
    pulses = pulses.at[:, 1, 1].set(0.0).at[:, 4, 1].set(0.0)
    q_pallas = pk.propagate_mc_pallas(pulses, delta, eps)
    q_xla = xla_prop.propagate_mc(pulses, delta, eps)
    np.testing.assert_allclose(np.asarray(q_pallas), np.asarray(q_xla),
                               atol=1e-5)


def test_amp_gradients_match_xla():
    pulses, delta, eps = make_amp_inputs(B=2, L=6, M=128, seed=14)
    q_t = su2.quat_normalize(jax.random.normal(jax.random.PRNGKey(9), (2, 4)))

    def obj_pallas(p, d, e):
        return 1.0 - jnp.mean(pk.mean_fidelity_pallas(p, q_t, d, e))

    def obj_xla(p, d, e):
        q = xla_prop.propagate_mc(p, d, e)
        return 1.0 - jnp.mean(su2.quat_fidelity(q, q_t[:, None, :]))

    g_p = jax.grad(obj_pallas, argnums=(0, 1, 2))(pulses, delta, eps)
    g_x = jax.grad(obj_xla, argnums=(0, 1, 2))(pulses, delta, eps)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_amp_negative_omega_clamp_gradient():
    """Segments with Ω_raw < 0 are clamped to free evolution and their Ω
    cotangent is zero — matching the XLA ``maximum(Ω, 0)`` semantics."""
    pulses, delta, eps = make_amp_inputs(B=1, L=5, M=128, seed=15)
    pulses = pulses.at[0, 2, 1].set(-0.3)
    q_t = su2.quat_normalize(jax.random.normal(jax.random.PRNGKey(3), (1, 4)))

    def obj_pallas(p):
        return jnp.mean(pk.mean_fidelity_pallas(p, q_t, delta, eps))

    def obj_xla(p):
        q = xla_prop.propagate_mc(p, delta, eps)
        return jnp.mean(su2.quat_fidelity(q, q_t[:, None, :]))

    g_p = jax.grad(obj_pallas)(pulses)
    g_x = jax.grad(obj_xla)(pulses)
    assert float(g_p[0, 2, 1]) == 0.0
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=1e-5)


def test_unsupported_pulse_param_count_raises():
    """P ∉ {2, 3, 4} must be an error, not silent wrong physics."""
    pulses, delta, eps = make_inputs(B=1, L=4, M=128)
    p5 = jnp.concatenate([pulses, pulses, pulses[..., :1]], axis=-1)  # P = 5
    with pytest.raises(ValueError, match="parameter count"):
        pk.propagate_mc_pallas(p5, delta, eps)
    q_t = su2.quat_normalize(jax.random.normal(jax.random.PRNGKey(1), (1, 4)))
    with pytest.raises(ValueError, match="parameter count"):
        pk.mean_fidelity_pallas(p5, q_t, delta, eps)
