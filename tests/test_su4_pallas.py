"""SU(4) SoA Pallas kernel vs the XLA oracle (interpret mode on CPU)."""

import pytest

# interpret-mode kernel compiles dominate the CPU suite wall-clock;
# run with the full tier (see README §Testing): pytest -m "" tests/
pytestmark = pytest.mark.slow


import jax
import jax.numpy as jnp
import numpy as np

from universal_quantum_optimal_control_tpu.core import su4
from universal_quantum_optimal_control_tpu.ops import (
    mean_fidelity_su4_pallas,
    propagate_su4_mc_pallas,
)


def _random_case(B=3, L=7, M=200, P=3, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    cols = [jax.random.uniform(k1, (B, L), minval=-3.1, maxval=3.1)]
    if P == 3:
        cols.append(jax.random.uniform(k2, (B, L), minval=0.0, maxval=2.0))
    cols.append(jax.random.uniform(k3, (B, L), minval=0.05, maxval=0.6))
    pulses = jnp.stack(cols, -1)
    d1 = jax.random.normal(k4, (B, M)) * 0.3
    d2 = jax.random.normal(k5, (B, M)) * 0.3
    ep = jax.random.normal(k6, (B, M)) * 0.05
    return pulses, d1, d2, ep


def test_su4_pallas_matches_xla_oracle():
    """SoA kernel == batched-matmul XLA path, incl. MC-axis lane padding
    (M = 200 is not a multiple of 128) and the Ω amplitude channel."""
    pulses, d1, d2, ep = _random_case(P=3)
    sys_ = su4.TwoQubitSystem(xtalk=0.1, coupling=0.5)
    Ur_x, Ui_x = su4.propagate_su4_mc(pulses, d1, d2, ep, sys_)
    Ur_p, Ui_p = propagate_su4_mc_pallas(pulses, d1, d2, ep,
                                         xtalk=0.1, coupling=0.5)
    np.testing.assert_allclose(np.asarray(Ur_p), np.asarray(Ur_x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(Ui_p), np.asarray(Ui_x), atol=2e-5)


def test_su4_pallas_two_param_space():
    pulses, d1, d2, ep = _random_case(P=2, seed=1)
    sys_ = su4.TwoQubitSystem()
    Ur_x, Ui_x = su4.propagate_su4_mc(pulses, d1, d2, ep, sys_)
    Ur_p, Ui_p = propagate_su4_mc_pallas(pulses, d1, d2, ep)
    np.testing.assert_allclose(np.asarray(Ur_p), np.asarray(Ur_x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(Ui_p), np.asarray(Ui_x), atol=2e-5)


def test_su4_pallas_fused_fidelity():
    """Fused on-chip fidelity+mean == XLA propagate → fidelity → mean."""
    pulses, d1, d2, ep = _random_case(P=3, seed=2)
    B = pulses.shape[0]
    sys_ = su4.TwoQubitSystem(xtalk=0.1, coupling=0.5)
    cz = np.diag([1, 1, 1, -1]).astype(np.complex64)
    TR = jnp.broadcast_to(jnp.asarray(cz.real), (B, 4, 4))
    TI = jnp.broadcast_to(jnp.asarray(cz.imag), (B, 4, 4))
    Ur, Ui = su4.propagate_su4_mc(pulses, d1, d2, ep, sys_)
    F_x = jnp.mean(su4.fidelity_su4_ri(Ur, Ui, TR[:, None], TI[:, None]),
                   axis=1)
    F_p = mean_fidelity_su4_pallas(pulses, TR, TI, d1, d2, ep,
                                   xtalk=0.1, coupling=0.5)
    np.testing.assert_allclose(np.asarray(F_p), np.asarray(F_x), atol=1e-5)


def test_su4_pallas_unitarity():
    """U†U = I for the kernel output (independent physics check)."""
    pulses, d1, d2, ep = _random_case(B=2, L=5, M=128, P=3, seed=3)
    Ur, Ui = propagate_su4_mc_pallas(pulses, d1, d2, ep)
    U = np.asarray(Ur) + 1j * np.asarray(Ui)
    prod = np.einsum("bmij,bmik->bmjk", U.conj(), U)
    eye = np.broadcast_to(np.eye(4), prod.shape)
    np.testing.assert_allclose(prod, eye, atol=2e-5)


def _random_case_drive2(B=2, L=5, M=200, seed=3):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    pulses = jnp.stack([
        jax.random.uniform(k1, (B, L), minval=-3.1, maxval=3.1),
        jax.random.uniform(k7, (B, L), minval=-3.1, maxval=3.1),
        jax.random.uniform(k2, (B, L), minval=0.0, maxval=1.5),
        jax.random.uniform(k3, (B, L), minval=0.05, maxval=0.6)], -1)
    d1 = jax.random.normal(k4, (B, M)) * 0.3
    d2 = jax.random.normal(k5, (B, M)) * 0.3
    ep = jax.random.normal(k6, (B, M)) * 0.05
    return pulses, d1, d2, ep


def test_su4_pallas_drive2_matches_xla_oracle():
    """drive2 variant (4-parameter pulses, direct drive on qubit 2 with
    symmetric cross-talk): SoA kernel == the XLA drive2 path, incl. lane
    padding."""
    pulses, d1, d2, ep = _random_case_drive2()
    sys_ = su4.TwoQubitSystem(xtalk=0.1, coupling=0.5, drive2=True)
    Ur_x, Ui_x = su4.propagate_su4_mc(pulses, d1, d2, ep, sys_)
    Ur_p, Ui_p = propagate_su4_mc_pallas(pulses, d1, d2, ep,
                                         xtalk=0.1, coupling=0.5,
                                         drive2=True)
    np.testing.assert_allclose(np.asarray(Ur_p), np.asarray(Ur_x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(Ui_p), np.asarray(Ui_x), atol=2e-5)


def test_su4_pallas_drive2_fused_fidelity():
    pulses, d1, d2, ep = _random_case_drive2(seed=4)
    sys_ = su4.TwoQubitSystem(drive2=True)
    tgt = _random_case_drive2(B=2, L=3, M=128, seed=5)[0]
    TUr, TUi = su4.propagate_su4(tgt, jnp.zeros(2), jnp.zeros(2),
                                 jnp.zeros(2), sys_)
    F_p = mean_fidelity_su4_pallas(pulses, TUr, TUi, d1, d2, ep,
                                   drive2=True)
    Ur, Ui = su4.propagate_su4_mc(pulses, d1, d2, ep, sys_)
    F_x = jnp.mean(su4.fidelity_su4_ri(Ur, Ui, TUr[:, None], TUi[:, None]),
                   axis=1)
    np.testing.assert_allclose(np.asarray(F_p), np.asarray(F_x), atol=2e-5)


def test_su4_pallas_drive2_wrong_param_count_raises():
    import pytest

    pulses, d1, d2, ep = _random_case(P=3)
    with pytest.raises(ValueError, match="drive2 expects 4-parameter"):
        propagate_su4_mc_pallas(pulses, d1, d2, ep, drive2=True)
    pulses4 = _random_case_drive2()[0]
    with pytest.raises(ValueError, match="require drive2"):
        propagate_su4_mc_pallas(pulses4, d1, d2, ep)
