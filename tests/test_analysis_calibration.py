r"""Round-4/5 calibration analysis surfaces — quick-tier coverage.

Covers the three CLIs the σ = 0.2 KAK-tail and P=4 ceiling calibrations
run on (`docs/two_qubit_results.md` §The σ = 0.2 KAK-tail calibration,
`docs/two_qubit_dephasing_bound.md`):

- ``analysis/p4_grape_ceiling.measure_ceiling`` (multi-start random-init
  P=4 GRAPE at tiny shapes),
- ``analysis/two_qubit_split_eval --per_target_csv/--dump_kak_percentiles``
  and the dumped-npz → ``workloads/two_qubit_grape --target_npz`` handoff
  (the format seam the percentile-ceiling methodology rides on),
- ``analysis/dephasing_bound.measure_channels`` (the drive2 per-channel
  decomposition, where the first-order bound is vacuous and calibration
  must be empirical).

Reference: the reference's analysis layer is untested (SURVEY §4 — one
active test in the whole repo); these tests are the anti-pattern rejection.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from universal_quantum_optimal_control_tpu.core import su4
from universal_quantum_optimal_control_tpu.training.systems import SU4System


def test_p4_grape_ceiling_tiny_shapes():
    from universal_quantum_optimal_control_tpu.analysis.p4_grape_ceiling \
        import measure_ceiling

    rows, best = measure_ceiling(
        starts=2, num_pulses=8, monte_carlo=32, eval_mc=64,
        learning_rate=3e-3, seed=0, curriculum=((0.4, 4),),
        backend="xla", gates=["X"])
    assert len(rows) == 1
    gate, ceiling, mean_f, best_start = rows[0]
    assert gate == "X"
    assert 0.0 <= ceiling <= 1.0 and 0.0 <= mean_f <= 1.0
    assert ceiling >= mean_f - 1e-6          # best-of-starts >= mean
    assert best_start in (0, 1)
    assert best["X"].shape == (8, 4)         # (L, P=4) pulse table


def _tiny_two_qubit_checkpoint(tmp_path, *, omega_min=0.05):
    """Init a tiny drive2 kak_tokens TwoQubitQOCTransformer and save it as
    the flat-npz checkpoint format every eval CLI takes."""
    from universal_quantum_optimal_control_tpu.data.su4_targets import (
        kak_input_tokens,
    )
    from universal_quantum_optimal_control_tpu.models import (
        normalize_pulse_space,
    )
    from universal_quantum_optimal_control_tpu.models.serialization import (
        save_params_npz,
    )
    from universal_quantum_optimal_control_tpu.models.two_qubit import (
        TwoQubitQOCTransformer,
    )

    space = {"phi1": (-3.15, 3.15), "phi2": (-3.15, 3.15),
             "omega": (omega_min, 1.0), "tau": (0.1, 0.5)}
    model = TwoQubitQOCTransformer(
        pulse_space=normalize_pulse_space(space), max_pulses=8,
        d_model=32, n_layers=1, n_heads=4, dtype=jnp.float32,
        kak_tokens=True)
    U = np.stack([np.eye(4, dtype=np.complex128)] * 2)
    tokens = jnp.asarray(kak_input_tokens(U))
    params = model.init(jax.random.PRNGKey(0), tokens)
    path = str(tmp_path / "tiny_two_qubit.npz")
    save_params_npz(path, params)
    return path


def test_split_eval_csv_and_percentile_dump_roundtrip(tmp_path):
    """--per_target_csv writes one row per eval target; the percentile dump
    emits the (4,4) complex 'u_target' npz that two_qubit_grape consumes."""
    from universal_quantum_optimal_control_tpu.analysis.two_qubit_split_eval \
        import main as split_main
    from universal_quantum_optimal_control_tpu.workloads.two_qubit_grape \
        import main as grape_main

    ckpt = _tiny_two_qubit_checkpoint(tmp_path)
    csv_path = str(tmp_path / "per_target.csv")
    dump_dir = str(tmp_path / "kak_targets")
    split_main([
        ckpt, "--sigma", "0.2", "--monte_carlo", "16", "--eval_size", "8",
        "--max_pulses", "8", "--d_model", "32", "--n_layers", "1",
        "--n_heads", "4", "--drive2", "--kak_tokens", "--omega_min", "0.05",
        "--per_target_csv", csv_path,
        "--dump_kak_percentiles", "50", "--dump_dir", dump_dir,
        "--channels_worst_decile", "--channels_mc", "32",
    ])

    rows = open(csv_path).read().strip().splitlines()
    assert rows[0] == "index,class,fid"
    assert len(rows) == 1 + 8                       # header + eval_size
    classes = [r.split(",")[1] for r in rows[1:]]
    assert classes == ["products"] * 4 + ["kak"] * 4
    fids = np.asarray([float(r.split(",")[2]) for r in rows[1:]])
    assert np.all((fids >= 0.0) & (fids <= 1.0))

    dumps = sorted(os.listdir(dump_dir))
    assert len(dumps) == 1 and dumps[0].startswith("kak_p50_i")
    npz = np.load(os.path.join(dump_dir, dumps[0]))
    u = npz["u_target"]
    assert u.shape == (4, 4) and np.iscomplexobj(u)
    # unitary up to f32 packing noise
    np.testing.assert_allclose(u @ u.conj().T, np.eye(4), atol=1e-4)
    # the dumped index is a KAK-half index with the matching per-target fid
    idx = int(dumps[0].split("_i")[1].split(".")[0])
    assert idx >= 4                                 # second (KAK) half
    np.testing.assert_allclose(float(npz["model_fid"]),
                               fids[idx], atol=1e-6)

    # the handoff: two_qubit_grape --target_npz consumes the dump as-is
    out_dir = str(tmp_path / "ceiling")
    grape_main([
        "--target_npz", os.path.join(dump_dir, dumps[0]),
        "--mode", "blocks", "--n_blocks", "2", "--n_starts", "2",
        "--steps", "2", "--monte_carlo", "8", "--drive2",
        "--sigmas", "", "--curve_sigmas", "0.1", "--curve_mc", "8",
        "--out", out_dir,
    ])
    saved = np.load(os.path.join(out_dir, "pulses.npz"))
    np.testing.assert_allclose(saved["u_target"], u)
    result = json.load(open(os.path.join(out_dir, "result.json")))
    stages = result["info"]["stages"]
    assert stages and 0.0 <= stages[0]["best_fid"] <= 1.0 + 1e-4


def test_measure_channels_drive2_decomposition():
    """σ = 0 rows must be exact: δ-only fidelities 1, full == ε-only, and
    the product column f₁·f₂·f_ε consistent by construction."""
    from universal_quantum_optimal_control_tpu.analysis.dephasing_bound \
        import measure_channels, rotation_budget

    rng = np.random.default_rng(7)
    B, L, M = 2, 14, 512
    system = SU4System(drive2=True)
    cols = [rng.uniform(-np.pi, np.pi, (B, L)),      # phi1
            rng.uniform(-np.pi, np.pi, (B, L)),      # phi2
            rng.uniform(0.05, 1.0, (B, L)),          # omega
            rng.uniform(0.1, 0.5, (B, L))]           # tau
    pulses = jnp.asarray(np.stack(cols, -1).astype(np.float32))
    z = jnp.zeros(B)
    Ur, Ui = su4.propagate_su4(pulses, z, z, z, system.system)
    targets = jnp.stack([Ur, Ui], axis=1)

    rows, T_mean, omega_bar = measure_channels(
        pulses, targets, [0.0, 0.3], system=system, monte_carlo=M, seed=3)

    assert len(rows) == 2
    s0, f1_0, f2_0, fe, full_0, prod_0 = rows[0]
    assert s0 == 0.0
    # zero disorder on a zero-disorder-defined target: exactly 1
    np.testing.assert_allclose([f1_0, f2_0], 1.0, atol=5e-3)
    np.testing.assert_allclose(full_0, fe, atol=5e-3)
    np.testing.assert_allclose(prod_0, f1_0 * f2_0 * fe, rtol=1e-6)

    s1, f1, f2, fe1, full, prod = rows[1]
    assert fe1 == fe                     # ε-only is σ-independent
    assert f1 < 1.0 and f2 < 1.0 and full <= min(f1, f2) + 0.05
    np.testing.assert_allclose(prod, f1 * f2 * fe, rtol=1e-6)

    # drive2 budget is (1+χ)Ω̄T — far past π/2 here → bound vacuous
    assert rotation_budget(T_mean, (1 + system.system.xtalk) * omega_bar) \
        > 0.5 * np.pi
