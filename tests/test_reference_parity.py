"""Numerical parity against the actual PyTorch reference implementation.

BASELINE.json requires E[F] parity vs the reference within 1e-3 across the
disorder sweep.  These tests import the reference (read-only mount at
/root/reference, torch-cpu) and compare against this framework on MATCHED
disorder samples — same pulses, same draws — so agreement is checked at
1e-4..1e-5, far inside the 1e-3 budget.  Skipped when the reference tree is
not present (e.g. on user machines).
"""

import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted")

if os.path.isdir(REF):
    sys.path.insert(0, REF)
    torch = pytest.importorskip("torch")
    from train.unitary_single_qubit_gate import (  # noqa: E402
        universal_single_qubit_SCORE as ref_score,
    )
    from model.universal_model import UniversalQOCTransformer as RefModel  # noqa: E402

from universal_quantum_optimal_control_tpu.core import (  # noqa: E402
    objectives,
    propagate,
    su2,
)
from universal_quantum_optimal_control_tpu.models import (  # noqa: E402
    score_embedding as se,
)


def make_pulses(B=6, L=20, seed=0):
    rng = np.random.default_rng(seed)
    phi = rng.uniform(-np.pi, np.pi, (B, L)).astype(np.float32)
    tau = rng.uniform(0.05, 0.5, (B, L)).astype(np.float32)
    return np.stack([phi, tau], axis=-1)


def test_propagator_matches_reference_exactly():
    """U_out parity: our quaternion scan vs the reference's
    matrix_exp + pairwise tree (SCORE.py:77-145), same inputs."""
    pulses = make_pulses()
    rng = np.random.default_rng(1)
    error = np.stack([rng.normal(0, 1.0, 6), rng.normal(0, 0.05, 6)]) \
        .astype(np.float32)

    U_ref = ref_score.batched_unitary_generator(
        torch.from_numpy(pulses), torch.from_numpy(error)).numpy()
    U_ours = np.asarray(propagate.unitary_generator(
        jnp.asarray(pulses), jnp.asarray(error)))
    np.testing.assert_allclose(U_ours, U_ref, atol=5e-5)


def test_fidelity_and_losses_match_reference():
    pulses = make_pulses(B=8, seed=2)
    rng = np.random.default_rng(3)
    error = np.stack([rng.normal(0, 0.7, 8), rng.normal(0, 0.05, 8)]) \
        .astype(np.float32)
    # random SU(2) targets
    q_t = np.asarray(su2.quat_normalize(
        jax.random.normal(jax.random.PRNGKey(4), (8, 4))))
    U_t = np.asarray(su2.quat_to_su2(jnp.asarray(q_t)))

    U_ref = ref_score.batched_unitary_generator(
        torch.from_numpy(pulses), torch.from_numpy(error))
    F_ref = ref_score.fidelity(U_ref, torch.from_numpy(U_t), 1).numpy()

    q_ours = propagate.propagate_scan(
        jnp.asarray(pulses), jnp.asarray(error[0]), jnp.asarray(error[1]))
    F_ours = np.asarray(objectives.entanglement_fidelity_q(
        q_ours, jnp.asarray(q_t)))
    np.testing.assert_allclose(F_ours, F_ref, atol=1e-5)

    # losses on the same mean fidelity
    mF_ref = float(F_ref.mean())
    np.testing.assert_allclose(
        float(objectives.sharp_loss(jnp.float32(mF_ref))),
        float(ref_score.sharp_loss(U_ref, torch.from_numpy(U_t),
                                   ref_score.fidelity, 1)),
        rtol=1e-4)
    np.testing.assert_allclose(
        float(objectives.negative_log_loss(jnp.float32(mF_ref))),
        float(ref_score.negative_log_loss(U_ref, torch.from_numpy(U_t),
                                          ref_score.fidelity, 1)),
        rtol=1e-4)


def test_expected_fidelity_parity_matched_samples():
    """E[F] parity on MATCHED Monte-Carlo draws — the BASELINE.json 1e-3
    criterion, checked at 1e-4 because sampling noise is eliminated."""
    pulses = make_pulses(B=1, L=40, seed=5)
    q_t = su2.rotation_vector_to_quat(
        jnp.asarray([[1.0, 0.0, 0.0, np.pi]], jnp.float32))
    U_t = np.asarray(su2.quat_to_su2(q_t))

    rng = np.random.default_rng(6)
    M = 10000
    for delta_std in (0.2, 0.7, 1.5):
        draws = np.stack([rng.normal(0, delta_std, M),
                          rng.normal(0, 0.05, M)]).astype(np.float32)
        pulses_rep = np.repeat(pulses, M, axis=0)
        U_ref = ref_score.batched_unitary_generator(
            torch.from_numpy(pulses_rep), torch.from_numpy(draws))
        EF_ref = float(ref_score.fidelity(
            U_ref, torch.from_numpy(np.repeat(U_t, M, axis=0)), 1).mean())

        q = propagate.propagate_mc(
            jnp.asarray(pulses), jnp.asarray(draws[0][None]),
            jnp.asarray(draws[1][None]))
        EF_ours = float(jnp.mean(objectives.entanglement_fidelity_q(
            q, q_t[:, None])))
        assert abs(EF_ours - EF_ref) < 1e-4, (delta_std, EF_ours, EF_ref)


def test_score_featurization_parity_reference_convention():
    """Token-level parity of the SCORE embedding (middle_convention=
    'reference') vs the reference model's featurization path
    (universal_model.py:148-308) on in-plane-free random targets."""
    rng = np.random.default_rng(7)
    B = 32
    n = rng.normal(size=(B, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    theta = rng.uniform(0.2, np.pi - 0.2, B)  # avoid gimbal-lock branches
    rv = np.concatenate([n, theta[:, None]], axis=1).astype(np.float32)

    # reference: rescale into xz-plane, YXY, SCORE sequence, flatten
    rv_t = torch.from_numpy(rv)
    n_xy = torch.sqrt(rv_t[:, 0] ** 2 + rv_t[:, 1] ** 2)
    rescaled = torch.stack(
        [n_xy, torch.zeros(B), rv_t[:, 2], rv_t[:, 3]], dim=1)
    euler_ref = RefModel.euler_yxy_from_rotation_vector(rescaled)
    seq_ref = RefModel.score_sequence_from_yxy(euler_ref)
    tokens_ref = RefModel._to_real_vector(seq_ref).to(torch.float32).numpy()

    tokens_ours, _ = se.score_features(jnp.asarray(rv),
                                       middle_convention="reference")
    np.testing.assert_allclose(np.asarray(tokens_ours), tokens_ref,
                               atol=2e-4)


def test_euler_yxy_agrees_with_reference_in_regular_branch():
    rng = np.random.default_rng(8)
    B = 64
    n = rng.normal(size=(B, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    theta = rng.uniform(0.3, np.pi - 0.3, B)
    rv = np.concatenate([n, theta[:, None]], axis=1).astype(np.float32)

    e_ref = RefModel.euler_yxy_from_rotation_vector(
        torch.from_numpy(rv)).numpy()
    e_ours = np.asarray(se.euler_yxy_from_rotation_vector(jnp.asarray(rv)))
    np.testing.assert_allclose(e_ours, e_ref, atol=1e-4)


def test_dataset_matches_reference_grid_structure():
    """Grid dataset: same θ/α meshgrid structure as SCORE.py:215-251
    (azimuth is random in both; compare the deterministic parts)."""
    from universal_quantum_optimal_control_tpu.data import build_su2_dataset

    torch.manual_seed(0)
    rv_ref, U_ref = ref_score.build_SU2_dataset(batch_size=100)
    rv_ours, q_ours = build_su2_dataset(jax.random.PRNGKey(0), 100)

    # polar angle of the axis and the rotation angle are deterministic
    nz_ref = rv_ref[:, 2].numpy()
    nz_ours = np.asarray(rv_ours[:, 2])
    np.testing.assert_allclose(nz_ours, nz_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rv_ours[:, 3]),
                               rv_ref[:, 3].numpy(), atol=1e-5)
    # our quaternions encode the same unitaries the reference builds from the
    # rotation vectors (U = expm(-i θ/2 n̂·σ), SCORE.py:243-248) — check
    # trace fidelity of quat_to_su2(q) against an independent scipy expm
    from scipy.linalg import expm as scipy_expm
    X = np.array([[0, 1], [1, 0]], complex)
    Y = np.array([[0, -1j], [1j, 0]], complex)
    Z = np.array([[1, 0], [0, -1]], complex)
    U_ours = np.asarray(su2.quat_to_su2(q_ours))
    rv_np = np.asarray(rv_ours, np.float64)
    for i in range(0, 100, 7):
        n = rv_np[i, :3] / np.linalg.norm(rv_np[i, :3])
        U_exp = scipy_expm(-0.5j * rv_np[i, 3]
                           * (n[0] * X + n[1] * Y + n[2] * Z))
        tr = np.trace(U_exp.conj().T @ U_ours[i])
        assert abs(abs(tr) / 2.0 - 1.0) < 1e-5, (i, tr)


def test_dcrab_objective_matches_reference_module():
    """Our jitted dCRAB infidelity equals the reference's NumPy objective
    (train/dCRAB/dCRAB.py:26-59) on identical parameters, frequencies, and
    disorder samples."""
    from train.dCRAB import dCRAB as ref_dcrab

    from universal_quantum_optimal_control_tpu.optimizers import dcrab

    rng = np.random.default_rng(11)
    N, T, dt, S = 4, 1.5, 0.05, 6
    t = np.arange(0, T, dt)
    omegas = rng.uniform(0.1, 6.0, N)
    params = np.concatenate([[0.2], 0.1 * rng.standard_normal(2 * N)])
    deltas = rng.normal(0, 0.4, S)
    epss = rng.normal(0, 0.05, S)
    X, Y, Z = ref_dcrab.pauli_matrices()
    from scipy.linalg import expm as scipy_expm
    U_target = scipy_expm(-1j * (np.pi / 2) * X / 2)

    ref_val = ref_dcrab.average_infidelity(
        params, t, omegas, U_target, deltas, epss, X, Y, Z)

    from universal_quantum_optimal_control_tpu.core.su2 import su2_to_quat
    got = dcrab.average_infidelity(
        jnp.asarray(params, jnp.float32), jnp.asarray(t, jnp.float32),
        jnp.asarray(omegas, jnp.float32),
        su2_to_quat(jnp.asarray(U_target, jnp.complex64)),
        jnp.asarray(deltas, jnp.float32), jnp.asarray(epss, jnp.float32), dt)
    np.testing.assert_allclose(float(got), ref_val, atol=3e-4)
