"""Trainer tests: end-to-end GRAPE curriculum smoke test, checkpointing,
metrics, and multi-device sharded training on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from universal_quantum_optimal_control_tpu.core import su2
from universal_quantum_optimal_control_tpu.data import build_su2_dataset
from universal_quantum_optimal_control_tpu.models import (
    GRAPE,
    UniversalQOCTransformer,
    normalize_pulse_space,
)
from universal_quantum_optimal_control_tpu.parallel import (
    make_mean_fidelity,
    make_mesh,
)
from universal_quantum_optimal_control_tpu.training import (
    CurriculumBand,
    MetricsLogger,
    TrainConfig,
    Trainer,
    restore_checkpoint,
    save_checkpoint,
)


def x_gate_data():
    rv = jnp.asarray([[1.0, 0.0, 0.0, np.pi]], jnp.float32)
    return rv, su2.rotation_vector_to_quat(rv)


def test_grape_curriculum_smoke_fidelity_increases(tmp_path):
    """Short curriculum: eval fidelity must improve and reach a sane level
    (reference-style GRAPE X-gate slice, tiny scale)."""
    model = GRAPE(num_pulses=16, pulse_space=normalize_pulse_space(
        {"phi": (-3.15, 3.15), "tau": (0.1, 0.5)}))
    rv, qt = x_gate_data()
    cfg = TrainConfig(monte_carlo=128, batch_size=1, epochs=25,
                      learning_rate=3e-3, loss="sharp", seed=0)
    trainer = Trainer(model, cfg)
    logger = MetricsLogger(path=str(tmp_path / "metrics.csv"))
    params, history = trainer.train(
        rv, qt, rv, qt,
        curriculum=[CurriculumBand(0.1), CurriculumBand(0.2)],
        save_dir=str(tmp_path / "ckpt"), logger=logger,
    )
    logger.flush()

    band0 = history["bands"][0]
    assert band0["eval_fid"][-1] > band0["eval_fid"][0]
    assert history["bands"][-1]["best_fid"] > 0.8

    # metrics CSV written with expected columns
    text = (tmp_path / "metrics.csv").read_text()
    assert "eval_fid" in text and "delta_std" in text
    assert len(text.strip().splitlines()) == 1 + 2 * 25

    # checkpoints saved per band and restorable
    from universal_quantum_optimal_control_tpu.training.checkpoint import (
        list_checkpoints,
    )
    tags = list_checkpoints(str(tmp_path / "ckpt"))
    assert len(tags) == 2
    restored, meta = restore_checkpoint(str(tmp_path / "ckpt"), tags[0])
    assert meta is not None and "best_fid" in meta
    flat_a = jax.tree_util.tree_leaves(restored)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat_a)


def test_trainer_transformer_one_band(tmp_path):
    model = UniversalQOCTransformer(
        num_qubits=1, max_pulses=6, d_model=16, n_layers=1, n_heads=2,
        dropout=0.1, dtype=jnp.float32,
        pulse_space=normalize_pulse_space({"phi": (-3.15, 3.15),
                                           "tau": (0.1, 0.5)}))
    rv, qt = build_su2_dataset(jax.random.PRNGKey(0), 8, random=True)
    cfg = TrainConfig(monte_carlo=64, batch_size=4, epochs=2,
                      learning_rate=1e-3)
    trainer = Trainer(model, cfg)
    params, history = trainer.train(rv, qt, rv, qt,
                                    curriculum=[CurriculumBand(0.2)])
    assert len(history["bands"]) == 1
    assert history["bands"][0]["best_fid"] > 0.3
    fid = trainer.evaluate(params, rv, qt, 0.2, 0.05)
    assert 0.0 < fid <= 1.0


def test_sharded_mean_fidelity_matches_local():
    mesh = make_mesh(8, data=2, mc=4)
    B, L, M = 4, 10, 256
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    pulses = jnp.stack([
        jax.random.uniform(k1, (B, L), minval=-np.pi, maxval=np.pi),
        jax.random.uniform(k2, (B, L), minval=0.05, maxval=0.5)], axis=-1)
    qt = su2.quat_normalize(jax.random.normal(k3, (B, 4)))
    delta = jax.random.normal(k4, (B, M))
    eps = jax.random.normal(k5, (B, M)) * 0.05

    local = make_mean_fidelity(None)
    sharded = make_mean_fidelity(mesh)
    f_local = local(pulses, qt, delta, eps)
    f_shard = jax.jit(sharded)(pulses, qt, delta, eps)
    np.testing.assert_allclose(float(f_local), float(f_shard), atol=1e-6)

    # gradients agree through the shard_map + pmean
    g_local = jax.grad(lambda p: local(p, qt, delta, eps))(pulses)
    g_shard = jax.jit(jax.grad(lambda p: sharded(p, qt, delta, eps)))(pulses)
    np.testing.assert_allclose(np.asarray(g_local), np.asarray(g_shard),
                               atol=1e-6)


def test_trainer_on_mesh_runs_and_improves():
    mesh = make_mesh(8, data=2, mc=4)
    model = GRAPE(num_pulses=12, pulse_space=normalize_pulse_space(
        {"phi": (-3.15, 3.15), "tau": (0.1, 0.5)}))
    rv, qt = x_gate_data()
    rv = jnp.tile(rv, (2, 1))
    qt = jnp.tile(qt, (2, 1))
    cfg = TrainConfig(monte_carlo=128, batch_size=2, epochs=15,
                      learning_rate=3e-3)
    trainer = Trainer(model, cfg, mesh=mesh)
    params, history = trainer.train(rv, qt, rv, qt,
                                    curriculum=[CurriculumBand(0.1)])
    h = history["bands"][0]
    assert h["eval_fid"][-1] > h["eval_fid"][0]
    assert h["best_fid"] > 0.7


def test_checkpoint_roundtrip(tmp_path):
    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "b": {"x": jnp.ones(4, dtype=jnp.bfloat16)}}
    save_checkpoint(str(tmp_path), params, "t0", metadata={"k": 1.5})
    restored, meta = restore_checkpoint(str(tmp_path), "t0", target=params)
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(params["w"]))
    assert restored["b"]["x"].dtype == jnp.bfloat16
    assert meta == {"k": 1.5}


def test_resume_mid_band(tmp_path):
    """Full-state resume: kill after band 0 epoch 3, resume, and the final
    state matches a continuous run's band/epoch structure."""
    model = GRAPE(num_pulses=8, direct=False,
                  pulse_space=normalize_pulse_space(
                      {"phi": (-3.15, 3.15), "tau": (0.1, 0.5)}))
    rv, qt = x_gate_data()
    cfg = TrainConfig(monte_carlo=64, batch_size=1, epochs=6,
                      learning_rate=3e-3, state_every=1, seed=3)
    save_dir = str(tmp_path / "run")

    # run A: crashes after 3 epochs of band 0 (simulated by training only
    # band 0 for 3 epochs — its saved states carry band_idx=0, epoch=3)
    trainer_a = Trainer(model, cfg)
    params_a, _ = trainer_a.train(
        rv, qt, rv, qt, curriculum=[CurriculumBand(0.1)],
        save_dir=save_dir, epochs=3)

    from universal_quantum_optimal_control_tpu.training.resume import (
        latest_step, restore_train_state,
    )
    assert latest_step(f"{save_dir}/state") is not None

    # run B: resume and finish the curriculum
    trainer_b = Trainer(model, cfg)
    params_b, history = trainer_b.train(
        rv, qt, rv, qt, curriculum=[CurriculumBand(0.1), CurriculumBand(0.2)],
        save_dir=save_dir, epochs=6, resume=True)
    # band 0 resumed at epoch 3 -> only 3 more epochs recorded there
    assert len(history["bands"][0]["eval_fid"]) == 3
    assert len(history["bands"][1]["eval_fid"]) == 6
    assert history["bands"][1]["best_fid"] > 0.5


@pytest.mark.slow
def test_profile_trace_written(tmp_path):
    model = GRAPE(num_pulses=6, pulse_space=normalize_pulse_space(
        {"phi": (-3.15, 3.15), "tau": (0.1, 0.5)}))
    rv, qt = x_gate_data()
    cfg = TrainConfig(monte_carlo=32, batch_size=1, epochs=4,
                      profile_dir=str(tmp_path / "prof"), profile_steps=2)
    trainer = Trainer(model, cfg)
    trainer.train(rv, qt, rv, qt, curriculum=[CurriculumBand(0.1)])
    import os
    found = []
    for root, _, files in os.walk(tmp_path / "prof"):
        found += [f for f in files if f.endswith((".pb", ".trace.json.gz"))]
    assert found, "no profiler trace files written"


@pytest.mark.slow
def test_bf16_transformer_training_runs_and_improves():
    """The TPU-default bf16 compute path trains without NaNs and improves."""
    model = UniversalQOCTransformer(
        num_qubits=1, max_pulses=6, d_model=32, n_layers=2, n_heads=4,
        dropout=0.1, dtype=jnp.bfloat16,
        pulse_space=normalize_pulse_space({"phi": (-3.15, 3.15),
                                           "tau": (0.1, 0.5)}))
    rv, qt = x_gate_data()
    cfg = TrainConfig(monte_carlo=64, batch_size=1, epochs=15,
                      learning_rate=3e-3)
    trainer = Trainer(model, cfg)
    params, history = trainer.train(rv, qt, rv, qt,
                                    curriculum=[CurriculumBand(0.1)])
    h = history["bands"][0]
    assert all(np.isfinite(v) for v in h["eval_fid"])
    assert h["eval_fid"][-1] > h["eval_fid"][0]


def test_fused_epoch_matches_structure_and_improves():
    """fused_epoch=True (device-side minibatch scan) trains equivalently."""
    model = GRAPE(num_pulses=12, pulse_space=normalize_pulse_space(
        {"phi": (-3.15, 3.15), "tau": (0.1, 0.5)}))
    rv, qt = build_su2_dataset(jax.random.PRNGKey(0), 8, random=True)
    cfg = TrainConfig(monte_carlo=64, batch_size=4, epochs=12,
                      learning_rate=3e-3, fused_epoch=True)
    trainer = Trainer(model, cfg)
    params, history = trainer.train(rv, qt, rv, qt,
                                    curriculum=[CurriculumBand(0.1)])
    h = history["bands"][0]
    assert len(h["eval_fid"]) == 12
    assert h["eval_fid"][-1] > h["eval_fid"][0]
    assert all(np.isfinite(v) for v in h["eval_fid"])


def test_cosine_schedule_trains():
    model = GRAPE(num_pulses=10, pulse_space=normalize_pulse_space(
        {"phi": (-3.15, 3.15), "tau": (0.1, 0.5)}))
    rv, qt = x_gate_data()
    cfg = TrainConfig(monte_carlo=64, batch_size=1, epochs=15,
                      learning_rate=1e-2, lr_schedule="cosine",
                      lr_schedule_steps=15)
    trainer = Trainer(model, cfg)
    params, history = trainer.train(rv, qt, rv, qt,
                                    curriculum=[CurriculumBand(0.1)])
    h = history["bands"][0]
    assert h["eval_fid"][-1] > h["eval_fid"][0]


def test_sharded_pallas_backend_on_mesh():
    """shard_map + the Pallas kernel (interpret mode on CPU): per-shard MC
    slices stay lane-aligned and match the local XLA objective."""
    mesh = make_mesh(8, data=2, mc=4)
    B, L, M = 4, 6, 4 * 128  # 128 samples per mc shard
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    pulses = jnp.stack([
        jax.random.uniform(k1, (B, L), minval=-np.pi, maxval=np.pi),
        jax.random.uniform(k2, (B, L), minval=0.05, maxval=0.5)], axis=-1)
    qt = su2.quat_normalize(jax.random.normal(k3, (B, 4)))
    delta = jax.random.normal(k4, (B, M))
    eps = jax.random.normal(k5, (B, M)) * 0.05

    local = make_mean_fidelity(None, backend="xla")
    sharded_pallas = make_mean_fidelity(mesh, backend="pallas")
    f_local = local(pulses, qt, delta, eps)
    f_shard = jax.jit(sharded_pallas)(pulses, qt, delta, eps)
    np.testing.assert_allclose(float(f_local), float(f_shard), atol=1e-5)


def test_reset_optimizer_per_band():
    model = GRAPE(num_pulses=8, pulse_space=normalize_pulse_space(
        {"phi": (-3.15, 3.15), "tau": (0.1, 0.5)}))
    rv, qt = x_gate_data()
    cfg = TrainConfig(monte_carlo=32, batch_size=1, epochs=5,
                      learning_rate=3e-3, reset_optimizer_per_band=True)
    trainer = Trainer(model, cfg)
    params, history = trainer.train(
        rv, qt, rv, qt, curriculum=[CurriculumBand(0.1), CurriculumBand(0.2)])
    assert len(history["bands"]) == 2
    assert all(np.isfinite(v) for b in history["bands"]
               for v in b["eval_fid"])


@pytest.mark.slow
def test_shuffle_epochs_trains_and_differs():
    """--shuffle re-draws minibatch composition per epoch; training still
    converges and the trajectory differs from the fixed-order run."""
    def run(shuffle):
        model = UniversalQOCTransformer(
            num_qubits=1, max_pulses=6, d_model=16, n_layers=1, n_heads=2,
            dropout=0.0, dtype=jnp.float32,
            pulse_space=normalize_pulse_space({"phi": (-3.15, 3.15),
                                               "tau": (0.1, 0.5)}))
        rv, qt = build_su2_dataset(jax.random.PRNGKey(0), 16, random=False)
        cfg = TrainConfig(monte_carlo=32, batch_size=4, epochs=3,
                          learning_rate=1e-3, shuffle=shuffle)
        trainer = Trainer(model, cfg)
        _, history = trainer.train(rv, qt, rv, qt,
                                   curriculum=[CurriculumBand(0.2)])
        return history["bands"][0]

    fixed = run(False)
    shuffled = run(True)
    assert all(np.isfinite(v) for v in shuffled["eval_fid"])
    # same init/PRNG; only batch composition differs — trajectories diverge
    assert not np.allclose(fixed["train_loss"], shuffled["train_loss"])


def test_collapse_recovery_reloads_best():
    """With a destabilizing learning rate, the mid-band recovery must fire
    (reload band-best params + fresh optimizer) and keep eval finite."""
    model = GRAPE(num_pulses=8, pulse_space=normalize_pulse_space(
        {"phi": (-3.15, 3.15), "tau": (0.1, 0.5)}))
    rv, qt = x_gate_data()
    cfg = TrainConfig(monte_carlo=64, batch_size=1, epochs=30,
                      learning_rate=0.3, loss="sharp", seed=3,
                      recover_collapse=1e-4, recover_patience=1)
    trainer = Trainer(model, cfg)
    params, history = trainer.train(rv, qt, rv, qt,
                                    curriculum=[CurriculumBand(0.1)])
    band = history["bands"][0]
    # MC eval noise alone dips > 1e-4 below the running best within 30
    # epochs, so the recovery branch must fire at least once
    assert band["recoveries"] >= 1, (
        "run never dipped 1e-4 below its best — scenario too tame")
    assert all(np.isfinite(v) for v in band["eval_fid"])


def test_tail_focus_objective_is_mean_of_worst_k_losses():
    """CVaR objective (TrainConfig.tail_focus): loss equals the mean of the
    per-target sharp losses over the worst-k targets; the aux stays the full
    batch-mean E[F]."""
    from universal_quantum_optimal_control_tpu.core import objectives

    model = UniversalQOCTransformer(
        num_qubits=1, max_pulses=6, d_model=16, n_layers=1, n_heads=2,
        dropout=0.0, dtype=jnp.float32,
        pulse_space=normalize_pulse_space({"phi": (-3.15, 3.15),
                                           "tau": (0.1, 0.5)}))
    rv, qt = build_su2_dataset(jax.random.PRNGKey(1), 8, random=True)
    cfg = TrainConfig(monte_carlo=32, batch_size=8, epochs=1,
                      tail_focus=0.25)
    trainer = Trainer(model, cfg)
    params = trainer.init_params(rv[:2])
    errors = trainer.system.sample_errors(
        jax.random.PRNGKey(2), (8, 32), 0.3, 0.05)

    loss, aux = trainer._objective(params, rv, qt, errors, None)

    pulses = trainer._apply_model(params, rv)
    f = np.asarray(trainer.system.local_mean_fidelity(pulses, qt, errors))
    per_target_loss = np.asarray(objectives.sharp_loss(
        jnp.asarray(f), cfg.loss_tau_bar, cfg.loss_k))
    k = max(1, round(cfg.tail_focus * 8))
    expected = np.sort(per_target_loss)[::-1][:k].mean()
    np.testing.assert_allclose(float(loss), expected, rtol=1e-6)
    np.testing.assert_allclose(float(aux), f.mean(), rtol=1e-6)
    assert k == 2  # the worst-2 of 8: genuinely a strict subset

    # mixture semantics (TrainConfig.tail_weight): loss blends the
    # mean-anchored objective with the CVaR term
    cfg_mix = TrainConfig(monte_carlo=32, batch_size=8, epochs=1,
                          tail_focus=0.25, tail_weight=0.5)
    trainer_mix = Trainer(model, cfg_mix)
    loss_mix, aux_mix = trainer_mix._objective(params, rv, qt, errors, None)
    mean_loss = float(objectives.sharp_loss(
        jnp.asarray(f.mean()), cfg_mix.loss_tau_bar, cfg_mix.loss_k))
    k_mix = max(1, round(cfg_mix.tail_focus * 8))
    per_target_mix = np.asarray(objectives.sharp_loss(
        jnp.asarray(f), cfg_mix.loss_tau_bar, cfg_mix.loss_k))
    cvar_mix = np.sort(per_target_mix)[::-1][:k_mix].mean()
    np.testing.assert_allclose(float(loss_mix),
                               0.5 * mean_loss + 0.5 * cvar_mix, rtol=1e-6)
    np.testing.assert_allclose(float(aux_mix), f.mean(), rtol=1e-6)

    # out-of-range mixture weights are config mistakes, not modes:
    # w < 0 would maximize the worst-target loss, w > 1 silently clamps
    for bad_w in (-0.5, 1.5):
        with pytest.raises(ValueError, match="tail_weight"):
            Trainer(model, TrainConfig(monte_carlo=32, batch_size=8,
                                       epochs=1, tail_focus=0.25,
                                       tail_weight=bad_w))


def test_per_target_objective_sharded_matches_local():
    """make_per_target_objective on the virtual mesh == unsharded (B,)."""
    from universal_quantum_optimal_control_tpu.training.systems import (
        SU2System,
        make_per_target_objective,
    )

    mesh = make_mesh(8, data=2, mc=4)
    system = SU2System()
    B, L, M = 4, 10, 256
    k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(3), 5)
    pulses = jnp.stack([
        jax.random.uniform(k1, (B, L), minval=-np.pi, maxval=np.pi),
        jax.random.uniform(k2, (B, L), minval=0.05, maxval=0.5)], axis=-1)
    qt = su2.quat_normalize(jax.random.normal(k3, (B, 4)))
    errors = (jax.random.normal(k4, (B, M)),
              jax.random.normal(k5, (B, M)) * 0.05)

    local = make_per_target_objective(None, system.local_mean_fidelity)
    sharded = make_per_target_objective(mesh, system.local_mean_fidelity)
    f_local = np.asarray(local(pulses, qt, errors))
    f_shard = np.asarray(jax.jit(sharded)(pulses, qt, errors))
    assert f_local.shape == (B,) and f_shard.shape == (B,)
    np.testing.assert_allclose(f_local, f_shard, atol=1e-6)


def test_tail_focus_training_improves():
    """A short CVaR-loss curriculum still trains (GRAPE X-gate slice)."""
    model = GRAPE(num_pulses=12, pulse_space=normalize_pulse_space(
        {"phi": (-3.15, 3.15), "tau": (0.1, 0.5)}))
    rv, qt = x_gate_data()
    rv = jnp.tile(rv, (4, 1))
    qt = jnp.tile(qt, (4, 1))
    cfg = TrainConfig(monte_carlo=128, batch_size=4, epochs=15,
                      learning_rate=3e-3, tail_focus=0.5)
    trainer = Trainer(model, cfg)
    params, history = trainer.train(rv, qt, rv, qt,
                                    curriculum=[CurriculumBand(0.1)])
    h = history["bands"][0]
    assert h["eval_fid"][-1] > h["eval_fid"][0]
    assert h["best_fid"] > 0.7
