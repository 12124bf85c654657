"""Two-qubit workload tests: model, pretrain transfer, GRAPE slice on CZ."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from universal_quantum_optimal_control_tpu.core import su4
from universal_quantum_optimal_control_tpu.models import (
    GRAPE,
    UniversalQOCTransformer,
    normalize_pulse_space,
)
from universal_quantum_optimal_control_tpu.models.two_qubit import (
    TwoQubitQOCTransformer,
    transfer_encoder_params,
    unitary_tokens,
)
from universal_quantum_optimal_control_tpu.training import (
    CurriculumBand,
    TrainConfig,
    Trainer,
)
from universal_quantum_optimal_control_tpu.training.systems import SU4System

CZ = np.diag([1, 1, 1, -1]).astype(np.complex64)


def packed_cz(B=1):
    U = jnp.asarray(CZ)[None].repeat(B, axis=0)
    return SU4System.pack_target(U)


def test_unitary_tokens_roundtrip_structure():
    t = packed_cz(2)
    tok = unitary_tokens(t)
    assert tok.shape == (2, 4, 8)
    # row 3 of CZ: (0,0,0,-1) -> interleaved re/im
    np.testing.assert_allclose(
        np.asarray(tok[0, 3]), [0, 0, 0, 0, 0, 0, -1, 0], atol=1e-6)


def test_two_qubit_model_shapes():
    model = TwoQubitQOCTransformer(
        max_pulses=6, d_model=32, n_layers=2, n_heads=4, dtype=jnp.float32)
    t = packed_cz(3)
    params = model.init(jax.random.PRNGKey(0), t)
    pulses = model.apply(params, t)
    assert pulses.shape == (3, 6, 2)
    tau = np.asarray(pulses[..., 1])
    assert np.all(tau >= 0.1 - 1e-6) and np.all(tau <= 0.5 + 1e-6)


def test_encoder_transfer_from_single_qubit():
    kw = dict(d_model=32, n_layers=2, n_heads=4, dtype=jnp.float32)
    single = UniversalQOCTransformer(max_pulses=8, **kw)
    two = TwoQubitQOCTransformer(max_pulses=6, **kw)
    rv = jnp.asarray([[1.0, 0.0, 0.0, np.pi]], jnp.float32)
    p_single = single.init(jax.random.PRNGKey(0), rv)
    p_two = two.init(jax.random.PRNGKey(1), packed_cz())

    p_transfer = transfer_encoder_params(p_single, p_two)
    # encoder weights now equal the single-qubit ones...
    s0 = jax.tree_util.tree_leaves(p_single["params"]["encoder_0"])
    t0 = jax.tree_util.tree_leaves(p_transfer["params"]["encoder_0"])
    for a, b in zip(s0, t0):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...but the projection/head keep the two-qubit init
    np.testing.assert_array_equal(
        np.asarray(p_transfer["params"]["head"]["kernel"]),
        np.asarray(p_two["params"]["head"]["kernel"]))
    # transferred params still produce valid pulses
    out = two.apply(p_transfer, packed_cz())
    assert np.all(np.isfinite(np.asarray(out)))


def test_transfer_also_cross_geometry_two_qubit_warm_start():
    """The round-5 warm-start paths: (a) L=40 -> L=100 transplant carries
    encoder blocks + unitary_proj and leaves the (L-shaped) head at the
    destination init; (b) 8-layer -> 12-layer transplant carries the head
    too (same geometry) and leaves the extra encoder blocks at init."""
    kw = dict(d_model=32, n_heads=4, dtype=jnp.float32)
    src = TwoQubitQOCTransformer(max_pulses=6, n_layers=2, **kw)
    p_src = src.init(jax.random.PRNGKey(0), packed_cz())

    # (a) cross-max_pulses: head shapes differ -> not copied even if named
    dst_l = TwoQubitQOCTransformer(max_pulses=9, n_layers=2, **kw)
    p_dst = dst_l.init(jax.random.PRNGKey(1), packed_cz())
    p_t = transfer_encoder_params(p_src, p_dst,
                                  also=("unitary_proj", "head"))
    np.testing.assert_array_equal(
        np.asarray(p_t["params"]["unitary_proj"]["kernel"]),
        np.asarray(p_src["params"]["unitary_proj"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(p_t["params"]["head"]["kernel"]),
        np.asarray(p_dst["params"]["head"]["kernel"]))
    assert dst_l.apply(p_t, packed_cz()).shape == (1, 9, 2)

    # (b) deeper destination: encoder_0..1 + head copied, encoder_2.. at init
    dst_d = TwoQubitQOCTransformer(max_pulses=6, n_layers=4, **kw)
    p_dst = dst_d.init(jax.random.PRNGKey(2), packed_cz())
    p_t = transfer_encoder_params(p_src, p_dst,
                                  also=("unitary_proj", "head"))
    np.testing.assert_array_equal(
        np.asarray(p_t["params"]["head"]["kernel"]),
        np.asarray(p_src["params"]["head"]["kernel"]))
    for a, b in zip(jax.tree_util.tree_leaves(p_src["params"]["encoder_1"]),
                    jax.tree_util.tree_leaves(p_t["params"]["encoder_1"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(p_dst["params"]["encoder_3"]),
                    jax.tree_util.tree_leaves(p_t["params"]["encoder_3"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_transfer_mismatched_widths_raises():
    single = UniversalQOCTransformer(max_pulses=8, d_model=16, n_layers=1,
                                     n_heads=2, dtype=jnp.float32)
    two = TwoQubitQOCTransformer(max_pulses=6, d_model=32, n_layers=1,
                                 n_heads=4, dtype=jnp.float32)
    rv = jnp.asarray([[1.0, 0.0, 0.0, np.pi]], jnp.float32)
    p_single = single.init(jax.random.PRNGKey(0), rv)
    p_two = two.init(jax.random.PRNGKey(1), packed_cz())
    import pytest
    with pytest.raises(ValueError):
        transfer_encoder_params(p_single, p_two)


def test_two_qubit_grape_slice_improves_on_reachable_target():
    """GRAPE through the SU(4) propagator: for a target that is reachable by
    construction (the zero-disorder propagation of a fixed entangling pulse
    sequence), optimization must recover high fidelity under small disorder.

    (CZ itself is NOT an easy L=8 target here because the drive is always-on
    with unit Rabi amplitude — synthesizing local Z rotations needs longer
    composite sequences; the offline two-qubit workload uses L≥40.)"""
    system = SU4System(xtalk=0.1, coupling=0.5)
    key = jax.random.PRNGKey(11)
    k1, k2 = jax.random.split(key)
    ref_pulses = jnp.stack([
        jax.random.uniform(k1, (1, 8), minval=-np.pi, maxval=np.pi),
        jax.random.uniform(k2, (1, 8), minval=0.1, maxval=0.5)], axis=-1)
    Ur, Ui = su4.propagate_su4(ref_pulses, jnp.zeros(1), jnp.zeros(1),
                               jnp.zeros(1), system.system)
    target = jnp.stack([Ur, Ui], axis=1)  # (1, 2, 4, 4) packed

    model = GRAPE(num_pulses=8, direct=True,
                  pulse_space=normalize_pulse_space(
                      {"phi": (-3.15, 3.15), "tau": (0.1, 0.5)}))
    model_input = target.reshape(1, -1)  # flattened conditioning input

    cfg = TrainConfig(monte_carlo=32, batch_size=1, epochs=80,
                      learning_rate=0.05, loss="infidelity", seed=0)
    trainer = Trainer(model, cfg, system=system)
    params, history = trainer.train(
        model_input, target, model_input, target,
        curriculum=[CurriculumBand(delta_std=0.02, epsilon_std=0.005)])
    h = history["bands"][0]
    assert h["eval_fid"][-1] > h["eval_fid"][0]
    assert h["best_fid"] > 0.8, h["best_fid"]


def test_su4_system_trainer_with_transformer():
    system = SU4System()
    model = TwoQubitQOCTransformer(max_pulses=4, d_model=16, n_layers=1,
                                   n_heads=2, dtype=jnp.float32)
    target = packed_cz(2)
    cfg = TrainConfig(monte_carlo=16, batch_size=2, epochs=2,
                      learning_rate=1e-3)
    trainer = Trainer(model, cfg, system=system)
    params, history = trainer.train(
        target, target, target, target,
        curriculum=[CurriculumBand(0.1)])
    assert 0.0 < history["bands"][0]["best_fid"] <= 1.0


def test_block_grape_reaches_cz():
    """The round-1 blocker (VERDICT missing #3): CZ must be reachable with
    direct gradient search at sigma=0.  The block-structured [drive; free-ZZ]
    parameterization converges from random starts (measured: every start)."""
    from universal_quantum_optimal_control_tpu.optimizers.two_qubit_grape import (
        TwoQubitGrapeConfig,
        multistart_grape_su4,
        named_two_qubit_targets,
    )

    cfg = TwoQubitGrapeConfig(mode="blocks", n_blocks=10, n_starts=4,
                              steps=260, learning_rate=0.05, seed=0)
    pulses, info = multistart_grape_su4(named_two_qubit_targets()["cz"], cfg)
    assert info["stages"][0]["best_fid"] > 0.99, info
    assert pulses.shape == (20, 3)
    # free segments exist: some omegas are exactly 0 (the ZZ resource)
    assert np.any(np.asarray(pulses[:, 1]) == 0.0)


def test_shipped_cz_drive2_pulse_beats_the_crosstalk_ceiling():
    """The shipped drive2 CZ pulse (demo/weights/cz_drive2_pulse.npz) is the
    dephasing-bound FALSIFICATION artifact: with a direct drive line on
    qubit 2 the delta2 toggling rate is Omega-bar instead of chi*Omega-bar,
    so delta2 becomes refocusable and the chi=0.1 cross-talk ceiling
    (E[F](sigma=0.2) = 0.48 for CZ GRAPE, docs/two_qubit_results.md) must
    vanish.  Measured on v5e: 0.9341 +/- 0.0018 at sigma=0.2 (M=4096).
    Here: re-propagate the pulse on the drive2 system at sigma=0.2 and
    require E[F] >= 0.90 (threshold leaves ~15 sigma of MC margin)."""
    from pathlib import Path

    path = (Path(__file__).parent.parent
            / "universal_quantum_optimal_control_tpu" / "demo" / "weights"
            / "cz_drive2_pulse.npz")
    data = np.load(path)
    pulses = jnp.asarray(data["pulses"])[None]          # (1, 20, 4)
    assert pulses.shape == (1, 20, 4)
    u_target = data["u_target"]
    system = su4.TwoQubitSystem(drive2=True)

    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    M = 2048
    d1 = jax.random.normal(k1, (1, M)) * 0.2
    d2 = jax.random.normal(k2, (1, M)) * 0.2
    ep = jax.random.normal(k3, (1, M)) * 0.05
    Ur, Ui = su4.propagate_su4_mc(pulses, d1, d2, ep, system)
    TR = jnp.asarray(u_target.real, jnp.float32)
    TI = jnp.asarray(u_target.imag, jnp.float32)
    F = np.asarray(su4.fidelity_su4_ri(Ur, Ui, TR, TI))[0]
    assert F.mean() > 0.90, F.mean()


# (the chi-only-system artifact two_qubit_d512.npz and its
# load-and-perform test were pruned in round 4: strictly dominated by the
# drive2 KAK trio, whose three artifacts-marked tests below exercise the
# same serializer->model->propagate path.)


# ---------------------------------------------------------------------------
# KAK / Makhlin featurization
# ---------------------------------------------------------------------------


def _makhlin_oracle(U):
    """Complex numpy oracle for the Makhlin invariants."""
    Q = (1.0 / np.sqrt(2.0)) * np.array(
        [[1, 0, 0, 1j], [0, 1j, 1, 0], [0, 1j, -1, 0], [1, 0, 0, -1j]],
        dtype=np.complex128)
    M = Q.conj().T @ U @ Q
    m = M.T @ M
    d = np.linalg.det(U)
    g1 = np.trace(m) ** 2 / (16.0 * d)
    g2 = (np.trace(m) ** 2 - np.trace(m @ m)) / (4.0 * d)
    return np.array([g1.real, g1.imag, g2.real])


def _rand_su2(rng):
    a = rng.normal(size=4)
    a /= np.linalg.norm(a)
    return np.array([[a[0] + 1j * a[1], a[2] + 1j * a[3]],
                     [-a[2] + 1j * a[3], a[0] - 1j * a[1]]])


def test_makhlin_invariants_match_oracle_and_known_gates():
    from universal_quantum_optimal_control_tpu.models.two_qubit import (
        makhlin_invariants_ri,
    )
    from universal_quantum_optimal_control_tpu.optimizers.two_qubit_grape import (
        named_two_qubit_targets,
    )

    gates = named_two_qubit_targets()
    U = np.stack([np.eye(4, dtype=np.complex64), gates["cz"],
                  gates["iswap"], gates["sqrt_swap"]])
    packed = SU4System.pack_target(U)
    got = np.asarray(makhlin_invariants_ri(packed))
    want = np.stack([_makhlin_oracle(u.astype(np.complex128)) for u in U])
    np.testing.assert_allclose(got, want, atol=1e-5)
    # textbook values: identity (1, 0, 3); CZ/CNOT class (0, 0, 1);
    # iSWAP (0, 0, -1); sqrt-SWAP class (0, ±1/4, 0) — our branch gives −i/4
    np.testing.assert_allclose(want, np.array(
        [[1.0, 0.0, 3.0], [0.0, 0.0, 1.0], [0.0, 0.0, -1.0],
         [0.0, -0.25, 0.0]]), atol=1e-6)


def test_makhlin_invariants_are_local_invariants():
    """(A1 x A2) U (B1 x B2) has the same invariants as U."""
    from universal_quantum_optimal_control_tpu.models.two_qubit import (
        makhlin_invariants_ri,
    )

    rng = np.random.default_rng(5)
    # a generic SU(4)-ish target from a zero-disorder propagation
    pulses = jnp.asarray(np.stack(
        [rng.uniform(-np.pi, np.pi, (1, 6)),
         rng.uniform(0.1, 0.5, (1, 6))], -1).astype(np.float32))
    z = jnp.zeros(1)
    Ur, Ui = su4.propagate_su4(pulses, z, z, z, su4.TwoQubitSystem())
    U = np.asarray(su4.complex_from_ri(Ur, Ui))[0].astype(np.complex128)

    A = np.kron(_rand_su2(rng), _rand_su2(rng))
    B = np.kron(_rand_su2(rng), _rand_su2(rng))
    both = np.stack([U, A @ U @ B])
    inv = np.asarray(makhlin_invariants_ri(SU4System.pack_target(both)))
    np.testing.assert_allclose(inv[0], inv[1], atol=2e-5)


def test_two_qubit_model_kak_features_shapes_and_grads():
    model = TwoQubitQOCTransformer(
        pulse_space=normalize_pulse_space({"phi": (-3.15, 3.15),
                                           "tau": (0.1, 0.5)}),
        max_pulses=6, d_model=32, n_layers=2, n_heads=4,
        dtype=jnp.float32, kak_features=True)
    t = SU4System.pack_target(np.stack([np.eye(4, dtype=np.complex64)] * 3))
    params = model.init(jax.random.PRNGKey(0), t)
    pulses = model.apply(params, t)
    assert pulses.shape == (3, 6, 2)

    def loss(p):
        return jnp.sum(model.apply(p, t) ** 2)

    g = jax.grad(loss)(params)
    assert all(jnp.all(jnp.isfinite(x)) for x in jax.tree_util.tree_leaves(g))


# ---------------------------------------------------------------------------
# SU(4) target construction (data/su4_targets.py)
# ---------------------------------------------------------------------------


def test_kak_targets_are_su4_and_hit_edge_classes():
    """KAK-constructed targets are exact SU(4) elements, and the Cartan
    core at c=(pi/4,0,0) is locally equivalent to CZ (same Makhlin
    invariants) — the edge class random products never cover."""
    from universal_quantum_optimal_control_tpu.data.su4_targets import (
        _cartan_exp,
        kak_targets,
    )

    rng = np.random.default_rng(5)
    U = kak_targets(rng, 16)
    eye = np.eye(4)
    for u in U:
        np.testing.assert_allclose(u @ u.conj().T, eye, atol=1e-10)
        assert abs(np.linalg.det(u) - 1.0) < 1e-10

    core_cz = _cartan_exp(np.array([[np.pi / 4, 0.0, 0.0]]))[0]
    np.testing.assert_allclose(_makhlin_oracle(core_cz),
                               _makhlin_oracle(np.asarray(CZ, complex)),
                               atol=1e-10)
    core_iswap = _cartan_exp(np.array([[np.pi / 4, np.pi / 4, 0.0]]))[0]
    iswap = np.array([[1, 0, 0, 0], [0, 0, 1j, 0],
                      [0, 1j, 0, 0], [0, 0, 0, 1]], complex)
    np.testing.assert_allclose(_makhlin_oracle(core_iswap),
                               _makhlin_oracle(iswap), atol=1e-10)


def test_z4_representatives_are_su4_and_phase_equivalent():
    from universal_quantum_optimal_control_tpu.data.su4_targets import (
        z4_representatives,
    )

    reps = z4_representatives(np.asarray(CZ, complex))  # det(CZ) = -1
    assert reps.shape == (4, 4, 4)
    for r in reps:
        assert abs(np.linalg.det(r) - 1.0) < 1e-10
        # same physical gate: |Tr(CZ^dag r)|^2 = 16
        assert abs(abs(np.trace(np.asarray(CZ).conj().T @ r)) - 4.0) < 1e-10
    # the four representatives are distinct matrices
    assert len({np.round(r[0, 0], 6) for r in reps}) == 4


def test_build_targets_modes_and_phase_augment():
    from universal_quantum_optimal_control_tpu.workloads.two_qubit import (
        build_targets,
    )

    system = su4.TwoQubitSystem()
    key = jax.random.PRNGKey(0)
    for mode in ("products", "kak", "mixed"):
        t = build_targets(key, 4, system, mode=mode)
        assert t.shape == (4, 2, 4, 4)
        U = np.asarray(t[:, 0]) + 1j * np.asarray(t[:, 1])
        for u in U:
            # product targets are f32 order-8 expm propagations (~1e-5)
            np.testing.assert_allclose(u @ u.conj().T, np.eye(4), atol=5e-5)
    ta = build_targets(key, 4, system, mode="kak", phase_augment=True)
    tb = build_targets(key, 4, system, mode="kak", phase_augment=False)
    Ua = np.asarray(ta[:, 0]) + 1j * np.asarray(ta[:, 1])
    Ub = np.asarray(tb[:, 0]) + 1j * np.asarray(tb[:, 1])
    # same gates up to phase, different matrices
    for a, b in zip(Ua, Ub):
        assert abs(abs(np.trace(a.conj().T @ b)) - 4.0) < 1e-4
    assert not np.allclose(Ua, Ub, atol=1e-3)


def test_kak_decompose_reconstructs_named_and_random():
    """Full host KAK decomposition (the SU(4) analog of the reference's
    YXY-Euler decomposition, universal_model.py:148-195): reconstruction
    must be exact up to the documented Z4 normalization, including at the
    degenerate chamber edges (CZ, iSWAP, SWAP, identity)."""
    from universal_quantum_optimal_control_tpu.data.su4_targets import (
        kak_decompose,
        kak_reconstruct,
    )

    rng = np.random.default_rng(2)
    z = rng.normal(size=(12, 4, 4)) + 1j * rng.normal(size=(12, 4, 4))
    cases = list(np.linalg.qr(z)[0])
    iswap = np.array([[1, 0, 0, 0], [0, 0, 1j, 0],
                      [0, 1j, 0, 0], [0, 0, 0, 1]], complex)
    swap = np.array([[1, 0, 0, 0], [0, 0, 1, 0],
                     [0, 1, 0, 0], [0, 0, 0, 1]], complex)
    cases += [np.asarray(CZ, complex), iswap, swap, np.eye(4) + 0j]
    for U in cases:
        A1, A2, c, B1, B2, g = kak_decompose(U)
        for loc in (A1, A2, B1, B2):
            np.testing.assert_allclose(loc @ loc.conj().T, np.eye(2),
                                       atol=1e-10)
            assert abs(np.linalg.det(loc) - 1.0) < 1e-10
        Uh = kak_reconstruct(A1, A2, c, B1, B2, g)
        ov = abs(np.trace(U.conj().T @ Uh)) / 4.0
        assert 1.0 - ov < 1e-9, (1.0 - ov, c)
    # CZ's Cartan class is the chamber edge (pi/4, 0, 0) up to reflection
    _, _, c_cz, _, _, _ = kak_decompose(np.asarray(CZ, complex))
    np.testing.assert_allclose(sorted(np.abs(c_cz), reverse=True),
                               [np.pi / 4, 0, 0], atol=1e-9)


def test_kak_input_tokens_and_model_mode():
    """kak_input_tokens featurizes f32-sourced targets (relaxed commutation)
    and the model's kak_tokens mode consumes them with valid pulses/grads."""
    from universal_quantum_optimal_control_tpu.data.su4_targets import (
        kak_input_tokens,
    )
    from universal_quantum_optimal_control_tpu.workloads.two_qubit import (
        build_targets,
    )

    system = su4.TwoQubitSystem(drive2=True)
    t = build_targets(jax.random.PRNGKey(1), 4, system, mode="mixed",
                      phase_augment=True)
    U = np.asarray(t[:, 0], np.float64) + 1j * np.asarray(t[:, 1], np.float64)
    toks = kak_input_tokens(U)
    assert toks.shape == (4, 9, 8) and np.isfinite(toks).all()

    model = TwoQubitQOCTransformer(
        max_pulses=6, d_model=32, n_layers=2, n_heads=4, dtype=jnp.float32,
        kak_tokens=True)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(toks))
    pulses = model.apply(params, jnp.asarray(toks))
    assert pulses.shape == (4, 6, 2)
    assert np.isfinite(np.asarray(pulses)).all()


def test_kak_canonicalize_invariance_and_classes():
    """Canonical Cartan coordinates are exactly local-invariant (the token
    the model sees is a true class label) and match the textbook classes:
    CZ (pi/4,0,0), iSWAP (pi/4,pi/4,0), SWAP (pi/4,pi/4,pi/4),
    sqrt_swap (pi/8,pi/8,pi/8)."""
    from universal_quantum_optimal_control_tpu.data.su4_targets import (
        haar_su2,
        kak_decompose,
        kak_reconstruct,
    )

    rng = np.random.default_rng(7)
    z = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    U = np.linalg.qr(z)[0]
    _, _, c0, _, _, _ = kak_decompose(U)
    for _ in range(5):
        l1, l2 = haar_su2(rng, 1)[0], haar_su2(rng, 1)[0]
        r1, r2 = haar_su2(rng, 1)[0], haar_su2(rng, 1)[0]
        V = np.kron(l1, l2) @ U @ np.kron(r1, r2)
        A1, A2, cV, B1, B2, g = kak_decompose(V)
        np.testing.assert_allclose(cV, c0, atol=1e-12)
        Vh = kak_reconstruct(A1, A2, cV, B1, B2, g)
        assert abs(np.trace(V.conj().T @ Vh)) / 4.0 > 1.0 - 1e-9

    iswap = np.array([[1, 0, 0, 0], [0, 0, 1j, 0],
                      [0, 1j, 0, 0], [0, 0, 0, 1]], complex)
    sqsw = np.array([[1, 0, 0, 0],
                     [0, .5 + .5j, .5 - .5j, 0],
                     [0, .5 - .5j, .5 + .5j, 0], [0, 0, 0, 1]], complex)
    for U_, c_ref in ((np.asarray(CZ, complex), [np.pi / 4, 0, 0]),
                      (iswap, [np.pi / 4, np.pi / 4, 0]),
                      (sqsw, [np.pi / 8] * 3)):
        _, _, c, _, _, _ = kak_decompose(U_)
        np.testing.assert_allclose(np.abs(c), c_ref, atol=1e-9)


@pytest.mark.artifacts
def test_shipped_drive2_kak_model_serves_named_gates_robustly():
    """The flagship two-qubit artifact (two_qubit_d2_kak.npz — the round-5
    L=100 time-budget retrain: drive2 system, KAK-mixed training targets,
    kak_tokens featurization, sigma=0.2 curriculum band) must serve the
    textbook edge-class gates — the measured failure mode of the round-2
    products-only model (CZ at chance level 0.20;
    docs/two_qubit_results.md) — at high fidelity AND far above the
    chi-cross-talk ceiling at sigma=0.2 (analytic delta2 bound 0.654;
    crosstalk-only CZ GRAPE measured 0.479)."""
    from pathlib import Path

    from universal_quantum_optimal_control_tpu.optimizers.two_qubit_grape \
        import named_two_qubit_targets
    from universal_quantum_optimal_control_tpu.workloads.two_qubit_eval \
        import best_phase_pulses, eval_pulse_tables

    path = (Path(__file__).parent.parent
            / "universal_quantum_optimal_control_tpu" / "demo" / "weights"
            / "two_qubit_d2_kak.npz")
    system = SU4System(drive2=True)
    gates = named_two_qubit_targets()
    U = np.stack([gates[g] for g in ("cz", "cnot", "sqrt_swap")])
    packed = SU4System.pack_target(U)
    pulses = best_phase_pulses(str(path), U, system, drive2=True,
                               kak_tokens=True, omega_min=0.05,
                               max_pulses=100)
    table = eval_pulse_tables(pulses, packed, [0.0, 0.2],
                              monte_carlo=512, system=system)
    # TPU reference (M=20000, L=100 weights): cz 0.9894/0.9679,
    # cnot 0.9904/0.9648, sqrt_swap 0.9935/0.9656 — wide MC margin
    assert table[:, 0].min() > 0.95, table
    assert table[:, 1].min() > 0.90, table


@pytest.mark.artifacts
def test_shipped_s04_band_model_serves_deep_disorder():
    """The sigma=0.4-band artifact (two_qubit_d2_kak_s04.npz — the round-5
    L=100 chain's deep-disorder band; docs/two_qubit_results.md §Round 5)
    must serve deep-disorder requests: at sigma=0.4 it beats the 32k L=40
    band it replaced on ALL FIVE named gates (TPU M=20000: cz 0.8451 vs
    0.7842, zz 0.8614 vs 0.8202, cnot 0.8386 vs 0.7061, iswap 0.7798 vs
    0.7121, sqrt_swap 0.7945 vs 0.7153), int8-encoded (matched-draw
    |dE[F]| <= 2e-3)."""
    from pathlib import Path

    from universal_quantum_optimal_control_tpu.optimizers.two_qubit_grape \
        import named_two_qubit_targets
    from universal_quantum_optimal_control_tpu.workloads.two_qubit_eval \
        import best_phase_pulses, eval_pulse_tables

    path = (Path(__file__).parent.parent
            / "universal_quantum_optimal_control_tpu" / "demo" / "weights"
            / "two_qubit_d2_kak_s04.npz")
    system = SU4System(drive2=True)
    gates = named_two_qubit_targets()
    U = np.stack([gates[g] for g in ("cz", "cnot", "zz(pi/4)")])
    packed = SU4System.pack_target(U)
    pulses = best_phase_pulses(str(path), U, system, drive2=True,
                               kak_tokens=True, omega_min=0.05,
                               max_pulses=100)
    table = eval_pulse_tables(pulses, packed, [0.0, 0.4],
                              monte_carlo=512, system=system)
    # shipped-artifact reference (TPU M=20000, L=100 weights): sigma=0.4
    # cz 0.8451 / cnot 0.8386 / zz 0.8614 — thresholds leave MC margin
    assert table[:, 0].min() > 0.85, table
    assert table[:, 1].min() > 0.75, table


@pytest.mark.artifacts
def test_shipped_s0_band_model_serves_named_gates_near_exactly():
    """The sigma=0 specialist (two_qubit_d2_kak_s0.npz: 16k-target band-0
    retrain) serves named gates at per-gate-bundle quality FROM THE
    UNIVERSAL MODEL — TPU M=20000 exact: cz 0.9957, zz 0.9996, cnot
    0.9912, iswap 0.9915, sqrt_swap 0.9968 (the per-gate finetuned
    bundle is 0.9960-0.9972).  Exact sigma=0 eval — no MC tolerance."""
    from pathlib import Path

    from universal_quantum_optimal_control_tpu.optimizers.two_qubit_grape \
        import named_two_qubit_targets
    from universal_quantum_optimal_control_tpu.workloads.two_qubit_eval \
        import best_phase_pulses, eval_pulse_tables

    path = (Path(__file__).parent.parent
            / "universal_quantum_optimal_control_tpu" / "demo" / "weights"
            / "two_qubit_d2_kak_s0.npz")
    system = SU4System(drive2=True)
    gates = named_two_qubit_targets()
    U = np.stack([gates[g] for g in ("cz", "cnot", "iswap", "sqrt_swap")])
    packed = SU4System.pack_target(U)
    pulses = best_phase_pulses(str(path), U, system, drive2=True,
                               kak_tokens=True, omega_min=0.05)
    table = eval_pulse_tables(pulses, packed, [0.0], monte_carlo=1,
                              system=system)
    assert table[:, 0].min() > 0.985, table


def test_split_eval_cli_reports_halves():
    """analysis/two_qubit_split_eval reproduces the trainer's held-out
    mixed eval set (products first half, KAK second half —
    workloads/two_qubit.py::build_targets) and reports the halves
    separately.  On the shipped flagship the products half must beat the
    KAK half (the measured generalization ordering,
    docs/two_qubit_results.md §The generalization wall)."""
    from pathlib import Path

    from universal_quantum_optimal_control_tpu.analysis.two_qubit_split_eval \
        import split_eval

    path = (Path(__file__).parent.parent
            / "universal_quantum_optimal_control_tpu" / "demo" / "weights"
            / "two_qubit_d2_kak.npz")
    out = split_eval(str(path), sigma=0.0, monte_carlo=4, eval_size=16,
                     chunk=8, drive2=True, kak_tokens=True, omega_min=0.05,
                     max_pulses=100)  # the round-5 L=100 flagship
    assert set(out) == {"products", "kak", "blended", "per_target",
                        "targets", "pulses"}
    assert 0.0 < out["kak"] <= 1.001 and 0.0 < out["products"] <= 1.001
    assert abs(out["blended"] - (out["products"] + out["kak"]) / 2) < 1e-6
    # per-target breakdown (the sigma=0.2 KAK calibration consumes these)
    assert out["per_target"].shape == (16,)
    assert out["targets"].shape == (16, 2, 4, 4)  # SoA (re, im) layout
    assert abs(out["per_target"][8:].mean() - out["kak"]) < 1e-6


def test_shipped_two_qubit_gate_bundle_loads_and_performs():
    """The per-gate finetuned SU(4) bundle (two_qubit_gates.npz,
    workloads/finetune_two_qubit_gates.py — the two-qubit analog of the
    single-qubit length100_gates bundles): each shipped table's EXACT
    sigma=0 fidelity must reproduce the recorded meta value (the eval is
    deterministic — no MC tolerance needed beyond float32 propagation)."""
    from pathlib import Path

    from universal_quantum_optimal_control_tpu.optimizers.two_qubit_grape \
        import named_two_qubit_targets
    from universal_quantum_optimal_control_tpu.workloads \
        .finetune_two_qubit_gates import load_two_qubit_gate_bundle

    path = (Path(__file__).parent.parent
            / "universal_quantum_optimal_control_tpu" / "demo" / "weights"
            / "two_qubit_gates.npz")
    tables, meta = load_two_qubit_gate_bundle(str(path))
    assert meta["drive2"] is True
    i0 = meta["sigmas"].index(0.0)
    system = su4.TwoQubitSystem(drive2=True)
    gates = named_two_qubit_targets()
    for i, g in enumerate(meta["gates"]):
        pulses = jnp.asarray(tables[g])[None]
        z = jnp.zeros((1,), jnp.float32)
        Ur, Ui = su4.propagate_su4(pulses, z, z, z, system)
        TR = jnp.asarray(gates[g].real, jnp.float32)
        TI = jnp.asarray(gates[g].imag, jnp.float32)
        F = float(su4.fidelity_su4_ri(Ur, Ui, TR, TI)[0])
        assert F >= meta["fidelity"][i][i0] - 2e-3, (g, F)
