r"""GRAPE single-qubit training — CLI entry point.

TPU-native equivalent of the reference GRAPE workload
(train/GRAPE/grape_train.py:269-323): L=400 pulse table via the bias-free MLP
reparameterization, pulse space φ ∈ (−3.15, 3.15), τ ∈ (0.035, 0.07),
curriculum δ_std ∈ {0.4, 0.7, 1.0} / ε_std 0.05, sharp loss, batch 100,
seed 42.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax

from ..data import build_su2_dataset
from ..models import GRAPE, normalize_pulse_space
from ..parallel import make_mesh
from ..training import CurriculumBand, MetricsLogger, TrainConfig, Trainer
from ..utils import load_model_params

DEFAULT_CONFIG = str(Path(__file__).parent.parent / "configs"
                     / "grape_single_qubit.json")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train GRAPE pulse model")
    p.add_argument("--num_epoch", type=int, default=1000)
    p.add_argument("--save_path", type=str, default="weights/GRAPE")
    p.add_argument("--config", type=str, default=DEFAULT_CONFIG)
    p.add_argument("--batch_size", type=int, default=100)
    p.add_argument("--monte_carlo", type=int, default=1000)
    p.add_argument("--learning_rate", type=float, default=3e-5)
    p.add_argument("--backend", type=str, default="xla",
                   choices=["xla", "pallas"])
    p.add_argument("--mesh", type=str, default=None)
    p.add_argument("--fused_epoch", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="scan minibatches on-device per epoch (default "
                        "on; --no-fused_epoch for per-step stepping)")
    p.add_argument("--lr_schedule", type=str, default="constant",
                   choices=["constant", "cosine"])
    p.add_argument("--direct", action="store_true",
                   help="optimize raw pulse logits (classic GRAPE) instead "
                        "of the reference MLP reparameterization; trains a "
                        "single-target pulse table for --target_axis/theta")
    p.add_argument("--target_axis", type=str, default="1,0,0",
                   help="direct mode: rotation axis of the single target")
    p.add_argument("--target_theta", type=float, default=3.141592653589793,
                   help="direct mode: rotation angle of the single target")
    p.add_argument("--seed", type=int, default=42)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    params_json = load_model_params(args.config)
    model = GRAPE(
        pulse_space=normalize_pulse_space(params_json["pulse_space"]),
        num_pulses=params_json["num_pulses"],
        direct=args.direct,
    )

    mesh = None
    if args.mesh:
        d, m = (int(x) for x in args.mesh.split(","))
        mesh = make_mesh(data=d, mc=m)

    cfg = TrainConfig(
        monte_carlo=args.monte_carlo, batch_size=args.batch_size,
        epochs=args.num_epoch, learning_rate=args.learning_rate,
        loss="sharp", backend=args.backend, seed=args.seed,
        fused_epoch=args.fused_epoch, lr_schedule=args.lr_schedule,
        lr_schedule_steps=3 * args.num_epoch * max(args.batch_size, 1),
    )
    trainer = Trainer(model, cfg, mesh=mesh)

    key = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(key)
    if args.direct:
        # classic GRAPE: one pulse table, one target; robustness comes from
        # the Monte-Carlo disorder axis, not target diversity
        import jax.numpy as jnp
        import numpy as np

        from ..core.su2 import rotation_vector_to_quat
        n = np.asarray([float(v) for v in args.target_axis.split(",")])
        n = n / max(np.linalg.norm(n), 1e-12)
        train_rv = jnp.asarray(
            [[n[0], n[1], n[2], args.target_theta]], jnp.float32)
        train_qt = rotation_vector_to_quat(train_rv)
        eval_rv, eval_qt = train_rv, train_qt
    else:
        train_rv, train_qt = build_su2_dataset(
            k1, args.batch_size ** 2, random=False)
        eval_rv, eval_qt = build_su2_dataset(k2, args.batch_size, random=True)

    curriculum = [CurriculumBand(d) for d in (0.4, 0.7, 1.0)]

    with MetricsLogger(path=f"{args.save_path}/metrics.csv",
                       echo=True) as logger:
        params, history = trainer.train(
            train_rv, train_qt, eval_rv, eval_qt,
            curriculum=curriculum, save_dir=args.save_path, logger=logger)

    best = max(b["best_fid"] for b in history["bands"])
    print(f"done; best eval fidelity across bands: {best:.4f}")


if __name__ == "__main__":
    main()
