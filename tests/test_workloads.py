"""End-to-end CLI smoke tests: each workload main runs at tiny scale, the
visualize driver and demo CLI render artifacts."""

import json
import sys

import numpy as np
import pytest


def write_tiny_universal_config(tmp_path):
    cfg = {
        "num_qubits": 1,
        "pulse_space": {"phi": [-3.15, 3.15], "tau": [0.1, 0.5]},
        "max_pulses": 6,
        "d_model": 16,
        "n_layers": 1,
        "n_heads": 2,
        "dropout": 0.1,
        "finetune": None,
    }
    path = tmp_path / "model_params.json"
    path.write_text(json.dumps(cfg))
    return str(path)


def test_universal_single_qubit_main(tmp_path):
    from universal_quantum_optimal_control_tpu.workloads import (
        universal_single_qubit as w,
    )

    cfg = write_tiny_universal_config(tmp_path)
    w.main([
        "--num_epoch", "1", "--save_path", str(tmp_path / "w"),
        "--config", cfg, "--batch_size", "4", "--monte_carlo", "16",
        "--train_size", "16", "--eval_size", "4",
    ])
    assert (tmp_path / "w" / "metrics.csv").exists()
    from universal_quantum_optimal_control_tpu.training.checkpoint import (
        list_checkpoints,
    )
    assert len(list_checkpoints(str(tmp_path / "w"))) == 3  # 3 bands


def test_grape_main(tmp_path):
    from universal_quantum_optimal_control_tpu.workloads import (
        grape_single_qubit as w,
    )

    cfg = tmp_path / "grape.json"
    cfg.write_text(json.dumps({
        "pulse_space": {"phi": [-3.15, 3.15], "tau": [0.035, 0.07]},
        "num_pulses": 10,
    }))
    w.main([
        "--num_epoch", "2", "--save_path", str(tmp_path / "g"),
        "--config", str(cfg), "--batch_size", "2", "--monte_carlo", "16",
    ])
    assert (tmp_path / "g" / "metrics.csv").exists()


def test_dcrab_main(tmp_path):
    from universal_quantum_optimal_control_tpu.workloads import (
        dcrab_single_qubit as w,
    )

    out = tmp_path / "dcrab.npz"
    w.main([
        "--mode", "grad", "--n_modes", "3", "--T", "1.0", "--dt", "0.05",
        "--rounds", "2", "--samples", "8", "--steps", "20",
        "--out", str(out),
    ])
    data = np.load(out)
    assert data["params"].shape == (7,)
    assert data["omegas"].shape == (3,)


def test_two_qubit_main(tmp_path):
    from universal_quantum_optimal_control_tpu.workloads import two_qubit as w

    w.main([
        "--num_epoch", "1", "--save_path", str(tmp_path / "t"),
        "--max_pulses", "4", "--d_model", "16", "--n_layers", "1",
        "--n_heads", "2", "--batch_size", "2", "--monte_carlo", "8",
        "--train_size", "4", "--eval_size", "2",
    ])
    assert (tmp_path / "t" / "metrics.csv").exists()


def test_visualize_driver_random_init(tmp_path):
    from universal_quantum_optimal_control_tpu.analysis import (
        visualize_universal as v,
    )

    cfg = write_tiny_universal_config(tmp_path)
    v.main([
        "--random-init", "--config", cfg, "--out", str(tmp_path / "viz"),
        "--monte_carlo", "200", "--gates", "X", "--skip-video",
    ])
    files = {p.name for p in (tmp_path / "viz").iterdir()}
    assert "X_pulses.csv" in files
    assert "X_contour.png" in files
    assert "X_params.png" in files
    assert "X_fidelity.png" in files


def test_demo_cli_random_init(tmp_path, monkeypatch):
    from universal_quantum_optimal_control_tpu.demo import app

    # point the length_100 variant at a tiny config for the test
    cfg = write_tiny_universal_config(tmp_path)
    monkeypatch.setitem(app.MODEL_VARIANTS, "tiny",
                        {"config": cfg, "checkpoint": None})
    app.load_pipeline.cache_clear()
    paths = app.render_artifacts("tiny", 1.0, 0.0, 0.0, float(np.pi),
                                 str(tmp_path / "demo"), random_init=True,
                                 monte_carlo=100, video=False)
    import os
    for k in ("csv", "contour", "params", "fidelity"):
        assert os.path.exists(paths[k]), k


def test_shipped_small20_weights_load_and_perform():
    """The in-repo pretrained artifact loads through the demo path and
    delivers a robust X(pi) pulse (E[F] > 0.8 at sigma=0.4)."""
    import jax.numpy as jnp
    from universal_quantum_optimal_control_tpu.analysis import (
        mc_fidelity_estimate,
    )
    from universal_quantum_optimal_control_tpu.core.su2 import (
        rotation_vector_to_quat,
    )
    from universal_quantum_optimal_control_tpu.demo import app

    app.load_pipeline.cache_clear()
    pulses, q_t = app.compute_pulses("small_20", 1.0, 0.0, 0.0,
                                     float(np.pi))
    assert pulses.shape == (20, 2)
    f, se = mc_fidelity_estimate(pulses, q_t, delta_std=0.4,
                                 monte_carlo=2000)
    assert f > 0.8, f


def test_shipped_length100_weights_load_and_perform():
    """The TPU-trained L=100 artifact: E[F] > 0.9 at sigma=0.4 on X(pi)."""
    from universal_quantum_optimal_control_tpu.analysis import (
        mc_fidelity_estimate,
    )
    from universal_quantum_optimal_control_tpu.demo import app

    app.load_pipeline.cache_clear()
    pulses, q_t = app.compute_pulses("length_100_med", 1.0, 0.0, 0.0,
                                     float(np.pi))
    assert pulses.shape == (100, 2)
    f, se = mc_fidelity_estimate(pulses, q_t, delta_std=0.4,
                                 monte_carlo=2000)
    assert f > 0.9, f


@pytest.mark.artifacts
def test_shipped_length100_flagship_loads_and_performs():
    """The flagship d512x8 L=100 artifact (the demo default): E[F] > 0.9 at
    sigma=0.4 on H — the theta=pi gimbal-branch gate that regressed before
    the continuous-limit YXY split fix (score_embedding.py)."""
    import math

    from universal_quantum_optimal_control_tpu.analysis import (
        mc_fidelity_estimate,
    )
    from universal_quantum_optimal_control_tpu.demo import app

    assert app.default_variant() == "length_100"
    app.load_pipeline.cache_clear()
    s2 = 1.0 / math.sqrt(2.0)
    pulses, q_t = app.compute_pulses("length_100", s2, 0.0, s2,
                                     float(np.pi))
    assert pulses.shape == (100, 2)
    f, se = mc_fidelity_estimate(pulses, q_t, delta_std=0.4,
                                 monte_carlo=2000)
    assert f > 0.9, f
    app.load_pipeline.cache_clear()  # drop the 46 MB pipeline from the cache


def test_shipped_gate_bundle_loads_and_performs():
    """The per-gate finetuned bundle (length100_gates.npz): every named gate's
    stored converged eval (200k MC, sigma=1) is at/above the measured
    single-target GRAPE ceiling 0.9536 (ROADMAP round-2 item), and the demo
    path actually serves the polished table for an exact named-gate request
    — verified by an independent MC estimate at sigma=1."""
    from universal_quantum_optimal_control_tpu.analysis import (
        mc_fidelity_estimate,
    )
    from universal_quantum_optimal_control_tpu.demo import app
    from universal_quantum_optimal_control_tpu.workloads.finetune_gates import (
        load_gate_bundle,
    )

    path = app.MODEL_VARIANTS["length_100_gates"]["gate_bundle"]
    tables, meta = load_gate_bundle(path)
    assert meta["delta_std"] == 1.0 and meta["eval_mc"] >= 100000
    for name, f in zip(meta["gates"], meta["fidelity_finetuned"]):
        assert f >= 0.9536 - 1e-4, (name, f)

    # exact named-gate request must be served from the bundle, not the model
    pulses, q_t = app.compute_pulses("length_100_gates", 1.0, 0.0, 0.0,
                                     float(np.pi))
    assert pulses.shape == (100, 2)
    np.testing.assert_array_equal(pulses, tables["X"])
    f, se = mc_fidelity_estimate(pulses, q_t, delta_std=1.0,
                                 monte_carlo=4000)
    assert f > 0.94, (f, se)


@pytest.mark.artifacts
def test_demo_blend_variant_serves_with_base_pulse():
    """length_400 is a finetune-blend variant: the demo pipeline must load
    the registered base pulse and serve 0.2*model + base (reference
    length_400.json 'finetune' semantics) — τ must stay near the base table
    (base τ∈(0.035,0.07), model residual ±0.1, relu) and never exceed it
    by more than the residual bound."""
    from universal_quantum_optimal_control_tpu.demo import app

    app.load_pipeline.cache_clear()
    pulses, q_t = app.compute_pulses("length_400", 1.0, 0.0, 0.0,
                                     float(np.pi), random_init=True)
    assert pulses.shape == (400, 2)
    assert float(pulses[:, 1].max()) <= 0.07 + 0.1 + 1e-6
    assert float(pulses[:, 1].min()) >= 0.0
    app.load_pipeline.cache_clear()


@pytest.mark.slow
def test_export_npz_roundtrip(tmp_path):
    """Orbax band checkpoint -> f16 npz -> load through the demo path."""
    from universal_quantum_optimal_control_tpu.workloads import (
        export_npz,
        universal_single_qubit as w,
    )

    cfg = {
        "num_qubits": 1,
        "pulse_space": {"phi": [-3.15, 3.15], "tau": [0.1, 0.5]},
        "max_pulses": 6, "d_model": 16, "n_layers": 1, "n_heads": 2,
        "dropout": 0.1, "finetune": None,
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    w.main(["--num_epoch", "1", "--save_path", str(tmp_path / "t"),
            "--config", str(cfg_path), "--batch_size", "4",
            "--monte_carlo", "8", "--train_size", "8", "--eval_size", "4"])
    out = tmp_path / "t.npz"
    export_npz.main([f"{tmp_path / 't'}:band2_delta1_eps0.05", str(out)])
    assert out.exists()

    from universal_quantum_optimal_control_tpu.demo import app
    app.MODEL_VARIANTS["_tiny_export"] = {"config": str(cfg_path),
                                          "checkpoint": str(out)}
    try:
        app.load_pipeline.cache_clear()
        pulses, _ = app.compute_pulses("_tiny_export", 1.0, 0.0, 0.0, 1.0)
        assert pulses.shape == (6, 2)
    finally:
        del app.MODEL_VARIANTS["_tiny_export"]
        app.load_pipeline.cache_clear()


@pytest.mark.artifacts
def test_shipped_length400_weights_load_and_perform():
    """The shipped length_400 blend artifact: E[F] > 0.9 at sigma=0.4 on
    X(pi) (trained band bests 0.998/0.984/0.957 — see weights/README.md)."""
    from universal_quantum_optimal_control_tpu.analysis import (
        mc_fidelity_estimate,
    )
    from universal_quantum_optimal_control_tpu.demo import app

    app.load_pipeline.cache_clear()
    pulses, q_t = app.compute_pulses("length_400", 1.0, 0.0, 0.0,
                                     float(np.pi))
    assert pulses.shape == (400, 2)
    f, se = mc_fidelity_estimate(pulses, q_t, delta_std=0.4,
                                 monte_carlo=2000)
    assert f > 0.9, f
    app.load_pipeline.cache_clear()


def test_universal_finetune_base_pulse_path(tmp_path):
    """The finetune blend workflow: train with an explicit base pulse table
    (the reference length_400 config semantics, minus torch.load-in-forward)."""
    from universal_quantum_optimal_control_tpu.workloads import (
        universal_single_qubit as w,
    )

    base = np.stack([np.zeros(6, np.float32),
                     np.full(6, 0.3, np.float32)], axis=-1)
    np.savez(tmp_path / "base.npz", pulses=base)
    cfg = {
        "num_qubits": 1,
        "pulse_space": {"phi": [-3.15, 3.15], "tau": [-0.5, 0.5]},
        "max_pulses": 6, "d_model": 16, "n_layers": 1, "n_heads": 2,
        "dropout": 0.1, "finetune": str(tmp_path / "base.npz"),
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    w.main([
        "--num_epoch", "1", "--save_path", str(tmp_path / "ft"),
        "--config", str(cfg_path), "--batch_size", "4", "--monte_carlo", "16",
        "--train_size", "16", "--eval_size", "4", "--fused_epoch",
    ])
    assert (tmp_path / "ft" / "metrics.csv").exists()


def test_unified_run_cli(tmp_path):
    from universal_quantum_optimal_control_tpu.workloads import run as runner

    cfg = {
        "workload": "grape_single_qubit",
        "model": {"pulse_space": {"phi": [-3.15, 3.15], "tau": [0.1, 0.5]},
                  "num_pulses": 8},
        "train": {"monte_carlo": 32, "batch_size": 4, "epochs": 2,
                  "learning_rate": 3e-3},
        "curriculum": [{"delta_std": 0.2}],
        "train_set_size": 16,
        "eval_set_size": 4,
    }
    p = tmp_path / "run.json"
    p.write_text(json.dumps(cfg))
    runner.main([str(p), "--save_path", str(tmp_path / "out")])
    assert (tmp_path / "out" / "metrics.csv").exists()


def test_shipped_p4_gate_bundle_beats_the_two_param_ceiling():
    """The 4-parameter (phi, Omega, Delta, tau) per-gate bundle
    (length100_gates_p4.npz): the detuning control must beat the P=2
    single-target GRAPE ceiling on EVERY named gate (stored 200k-MC evals
    0.9553-0.9583 vs the P=2 bundle's 0.9536-0.9558 at sigma=1), and the
    demo path serves the 4-column table for an exact named-gate request
    (propagated through the P=4 XLA dispatch for the MC check)."""
    from universal_quantum_optimal_control_tpu.analysis import (
        mc_fidelity_estimate,
    )
    from universal_quantum_optimal_control_tpu.demo import app
    from universal_quantum_optimal_control_tpu.workloads.finetune_gates import (
        load_gate_bundle,
    )

    p2_path = app.MODEL_VARIANTS["length_100_gates"]["gate_bundle"]
    p4_path = app.MODEL_VARIANTS["length_100_gates_p4"]["gate_bundle"]
    _, meta2 = load_gate_bundle(p2_path)
    tables4, meta4 = load_gate_bundle(p4_path)
    assert meta4["delta_std"] == 1.0 and meta4["eval_mc"] >= 100000
    p2_ceiling = dict(zip(meta2["gates"], meta2["fidelity_finetuned"]))
    for name, f in zip(meta4["gates"], meta4["fidelity_finetuned"]):
        assert f > p2_ceiling[name] + 5e-4, (name, f, p2_ceiling[name])

    pulses, q_t = app.compute_pulses("length_100_gates_p4", 1.0, 0.0, 0.0,
                                     float(np.pi))
    assert pulses.shape == (100, 4)
    np.testing.assert_array_equal(pulses, tables4["X"])
    f, se = mc_fidelity_estimate(pulses, q_t, delta_std=1.0,
                                 monte_carlo=4000)
    assert f > 0.945, (f, se)


@pytest.mark.artifacts
def test_shipped_p4_universal_model_beats_the_p2_flagship():
    """The 4-parameter universal flagship (length100_p4.npz — the
    reference's full declared pulse space, trained end-to-end through the
    P=4 fused kernels with the P=2 flagship's encoder transplanted): bands
    0.9943/0.9863/0.9629 vs the P=2 flagship's 0.9936/0.9802/0.9500, and
    every named gate at 0.9613-0.9626 at sigma=1 (M=20k on v5e) — above
    the P=2 single-target GRAPE ceiling (0.9536-0.9558).  Here: serve X
    through the demo path and require E[F](sigma=1) > 0.955 (P=2 ceiling
    0.9538; MC margin ~9 sigma at M=4000)."""
    from universal_quantum_optimal_control_tpu.analysis import (
        mc_fidelity_estimate,
    )
    from universal_quantum_optimal_control_tpu.demo import app

    app.load_pipeline.cache_clear()
    pulses, q_t = app.compute_pulses("length_100_p4", 1.0, 0.0, 0.0,
                                     float(np.pi))
    assert pulses.shape == (100, 4)
    f, se = mc_fidelity_estimate(pulses, q_t, delta_std=1.0,
                                 monte_carlo=4000)
    assert f > 0.955, (f, se)
    app.load_pipeline.cache_clear()


@pytest.mark.artifacts
def test_shipped_length400_p4_universal_model_loads_and_performs():
    """The L=400 4-parameter universal flagship (length400_p4.npz —
    reference length_400 budget with relu-zeroable tau, NO base-pulse
    blend): bands 0.9968/0.9853/0.9581 on v5e; named gates 0.9570-0.9585
    at sigma=1 (M=200k).  Serve X through the demo path and require
    E[F](sigma=1) > 0.95 (MC margin ~5 sigma at M=4000)."""
    from universal_quantum_optimal_control_tpu.analysis import (
        mc_fidelity_estimate,
    )
    from universal_quantum_optimal_control_tpu.demo import app

    app.load_pipeline.cache_clear()
    pulses, q_t = app.compute_pulses("length_400_p4", 1.0, 0.0, 0.0,
                                     float(np.pi))
    assert pulses.shape == (400, 4)
    # relu-zeroable tau: the model must actually USE the longer budget
    # (some nonzero segments) while being free to zero others
    assert float(np.asarray(pulses)[:, 3].max()) > 0.0
    f, se = mc_fidelity_estimate(pulses, q_t, delta_std=1.0,
                                 monte_carlo=4000)
    assert f > 0.95, (f, se)
    app.load_pipeline.cache_clear()


def test_polish_box_clamps_zeroable_tau():
    """Regression: polishing a model whose tau box is zeroable (low < 0,
    reference length_400.json semantics) must clamp the polish box to
    tau >= 0 — the raw box admits negative durations = time-reversed
    evolution, a perfect unphysical echo that 'reaches' E[F]=0.9999 at
    sigma=1 (observed before the guard)."""
    from universal_quantum_optimal_control_tpu.workloads.finetune_gates import (
        clamp_tau_nonnegative,
    )

    space = (("phi", (-3.15, 3.15)), ("omega", (0.05, 1.0)),
             ("delta", (-5.0, 5.0)), ("tau", (-0.5, 0.5)))
    out = clamp_tau_nonnegative(space)
    assert out[3] == ("tau", (0.0, 0.5))
    # non-tau channels untouched (delta is legitimately signed)
    assert out[:3] == space[:3]
    # reference "t" alias also guarded; already-positive boxes unchanged
    assert clamp_tau_nonnegative((("t", (0.1, 0.5)),)) == (("t", (0.1, 0.5)),)
