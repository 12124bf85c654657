r"""Universal single-qubit transformer training — CLI entry point.

TPU-native equivalent of the reference's primary workload
(train/unitary_single_qubit_gate/universal_single_qubit_SCORE.py:277-333):
SCORE-embedding transformer, 10k-grid train set / 1k random eval set,
curriculum δ_std ∈ {0.4, 0.7, 1.0} with ε_std = 0.05, sharp (log-barrier)
loss, batch 200, seed 0.

Usage:
    python -m universal_quantum_optimal_control_tpu.workloads.universal_single_qubit \
        --num_epoch 1000 --save_path weights/single_qubit_control \
        [--config configs/universal_single_qubit.json] [--mesh data,mc]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax

from ..data import build_su2_dataset
from ..models import UniversalQOCTransformer, normalize_pulse_space
from ..parallel import make_mesh
from ..training import CurriculumBand, MetricsLogger, TrainConfig, Trainer
from ..utils import load_model_params

DEFAULT_CONFIG = str(Path(__file__).parent.parent / "configs"
                     / "universal_single_qubit.json")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train universal QOC transformer")
    p.add_argument("--num_epoch", type=int, default=1000)
    p.add_argument("--save_path", type=str,
                   default="weights/single_qubit_control")
    p.add_argument("--config", type=str, default=DEFAULT_CONFIG,
                   help="model params JSON (reference-compatible)")
    p.add_argument("--batch_size", type=int, default=200,
                   help="reference: 200 for L=100, 50 for L=400")
    p.add_argument("--monte_carlo", type=int, default=1000)
    p.add_argument("--learning_rate", type=float, default=3e-5)
    p.add_argument("--lr_schedule", type=str, default="constant",
                   choices=["constant", "cosine"])
    p.add_argument("--backend", type=str, default="xla",
                   choices=["xla", "pallas"])
    p.add_argument("--mesh", type=str, default=None,
                   help="'data,mc' shards, e.g. '2,4'; default single device")
    p.add_argument("--train_size", type=int, default=10000)
    p.add_argument("--eval_size", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fused_epoch", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="scan minibatches on-device (one host round trip "
                        "per epoch — default on; --no-fused_epoch for "
                        "per-step stepping/profiling)")
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                   help="encoder compute dtype.  TRAINING defaults to f32: "
                        "bf16 under the fused epoch scan measurably degrades "
                        "curriculum convergence (band-0 0.78 vs 0.95 at "
                        "epoch 50 on the d256 recipe, measured on v5e); "
                        "serving/inference stays bf16 (model default)")
    p.add_argument("--f32", action="store_true",
                   help="deprecated alias for --dtype f32 (now the default)")
    p.add_argument("--reset_opt_per_band", action="store_true",
                   help="fresh Adam moments at each curriculum band (the "
                        "recipe that stabilizes the d512×8 flagship; the "
                        "reference keeps one optimizer across bands)")
    p.add_argument("--shuffle", action="store_true",
                   help="re-draw minibatch composition each epoch (the "
                        "reference iterates the grid dataset in fixed order, "
                        "so every minibatch is a narrow θ×α slice)")
    p.add_argument("--recover_collapse", type=float, default=0.0,
                   help="mid-band collapse recovery: reload band-best params "
                        "+ fresh optimizer when eval fidelity stays this far "
                        "below the band best for 3 consecutive epochs "
                        "(0 = off; 0.05 is a good value for d512×8)")
    p.add_argument("--state_every", type=int, default=0,
                   help="checkpoint FULL resume state every N epochs")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest saved state in --save_path")
    p.add_argument("--epochs_per_band", type=int, default=None,
                   help="alias for --num_epoch (epochs per curriculum band)")
    p.add_argument("--pretrained_encoder", type=str, default=None,
                   help="shipped flagship .npz whose encoder + unitary_proj "
                        "are transplanted before training (same SCORE-token "
                        "featurization; only the head re-initializes) — the "
                        "warm start for widened pulse-space runs (P=3/4)")
    p.add_argument("--finetune_base", type=str, default=None,
                   help="path to a base pulse table (.npz with 'pulses' or "
                        ".csv) for the finetune blend; implied by a string "
                        "'finetune' field in the config (reference "
                        "length_400 config semantics)")
    return p


def load_base_pulse(path: str):
    """Load a base pulse table for the finetune blend (npz or csv)."""
    import numpy as np

    if path.endswith(".npz"):
        data = np.load(path)
        arr = data["pulses"] if "pulses" in data else data[data.files[0]]
    else:
        arr = np.loadtxt(path, delimiter=",", skiprows=1)
    arr = np.asarray(arr, np.float32)
    if arr.ndim == 3:  # saved batch — use the first sequence
        arr = arr[0]
    return arr[None]  # (1, L, P), broadcasts over the batch


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    model_params = load_model_params(args.config)
    model_params["pulse_space"] = normalize_pulse_space(
        model_params["pulse_space"])
    finetune_cfg = model_params.get("finetune")
    base_path = args.finetune_base or (
        finetune_cfg if isinstance(finetune_cfg, str) else None)
    base_pulse = load_base_pulse(base_path) if base_path else None
    model_params["finetune"] = base_pulse is not None
    import jax.numpy as jnp
    dtype = "f32" if args.f32 else args.dtype
    model_params["dtype"] = jnp.float32 if dtype == "f32" else jnp.bfloat16
    model = UniversalQOCTransformer(**model_params)

    mesh = None
    if args.mesh:
        d, m = (int(x) for x in args.mesh.split(","))
        mesh = make_mesh(data=d, mc=m)

    epochs = (args.epochs_per_band if args.epochs_per_band is not None
              else args.num_epoch)
    # per-band optimizer reset also resets the schedule step counter, so the
    # cosine span must be ONE band's steps (warm restarts); without reset the
    # schedule runs globally across all 3 curriculum bands
    n_bands = 1 if args.reset_opt_per_band else 3
    cfg = TrainConfig(
        monte_carlo=args.monte_carlo, batch_size=args.batch_size,
        epochs=epochs, learning_rate=args.learning_rate,
        loss="sharp", backend=args.backend, seed=args.seed,
        fused_epoch=args.fused_epoch, lr_schedule=args.lr_schedule,
        lr_schedule_steps=n_bands * epochs * max(args.train_size
                                                 // args.batch_size, 1),
        reset_optimizer_per_band=args.reset_opt_per_band,
        shuffle=args.shuffle, recover_collapse=args.recover_collapse,
        state_every=args.state_every,
    )
    trainer = Trainer(model, cfg, mesh=mesh, base_pulse=base_pulse)

    key = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(key)
    train_rv, train_qt = build_su2_dataset(k1, args.train_size, random=False)
    eval_rv, eval_qt = build_su2_dataset(k2, args.eval_size, random=True)

    params = None
    if args.pretrained_encoder:
        # structure-free load: the source may have any head shape (P=2 or
        # P=4, any max_pulses) — only the shape-matching encoder blocks and
        # unitary_proj transplant
        from ..models.serialization import load_params_npz_tree
        from ..models.two_qubit import transfer_encoder_params

        src = load_params_npz_tree(args.pretrained_encoder)
        params = trainer.init_params(train_rv[:2])
        params = transfer_encoder_params(src, params,
                                         also=("unitary_proj",))
        print(f"transferred encoder from {args.pretrained_encoder}")

    # reference curriculum: delta_std in {0.4, 0.7, 1.0}, eps_std 0.05
    curriculum = [CurriculumBand(d) for d in (0.4, 0.7, 1.0)]

    with MetricsLogger(path=f"{args.save_path}/metrics.csv",
                       echo=True) as logger:
        params, history = trainer.train(
            train_rv, train_qt, eval_rv, eval_qt,
            curriculum=curriculum, params=params,
            save_dir=args.save_path, logger=logger)

    best = max(b["best_fid"] for b in history["bands"])
    print(f"done; best eval fidelity across bands: {best:.4f}")


if __name__ == "__main__":
    main()
