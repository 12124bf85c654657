r"""Unified config-driven runner: one JSON → any workload.

The per-workload CLIs mirror the reference's entry points; this runner takes
a single ``RunConfig`` JSON (model + train + curriculum + data sizes) and a
``workload`` field and dispatches — the "one dataclass/JSON config covering
everything" consolidation SURVEY.md §5 calls for.

Usage:
    python -m universal_quantum_optimal_control_tpu.workloads.run run.json \
        [--save_path out] [--num_epoch N]

Example JSON:
    {
      "workload": "universal_single_qubit",   // | grape_single_qubit | two_qubit
      "model": {"pulse_space": {"phi": [-3.15, 3.15], "tau": [0.1, 0.5]},
                "max_pulses": 100, "d_model": 256, "n_layers": 6,
                "n_heads": 8, "dropout": 0.1},
      "train": {"monte_carlo": 512, "batch_size": 256, "epochs": 30,
                "learning_rate": 1e-4},
      "curriculum": [{"delta_std": 0.4}, {"delta_std": 0.7},
                     {"delta_std": 1.0}],
      "train_set_size": 2048, "eval_set_size": 256, "save_path": "weights/run"
    }
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import jax

from ..data import build_su2_dataset
from ..models import GRAPE, UniversalQOCTransformer, normalize_pulse_space
from ..training import MetricsLogger, Trainer
from ..utils.config import RunConfig


def run(config: RunConfig, workload: str) -> float:
    model_kwargs = dict(config.model)
    model_kwargs["pulse_space"] = normalize_pulse_space(
        model_kwargs["pulse_space"])

    if workload == "universal_single_qubit":
        model_kwargs.setdefault("finetune", False)
        model_kwargs["finetune"] = bool(model_kwargs["finetune"])
        model = UniversalQOCTransformer(**model_kwargs)
    elif workload == "grape_single_qubit":
        model = GRAPE(**model_kwargs)
    elif workload == "two_qubit":
        from ..models.two_qubit import TwoQubitQOCTransformer
        model = TwoQubitQOCTransformer(**model_kwargs)
    else:
        raise ValueError(f"unknown workload: {workload}")

    trainer = Trainer(model, config.train)
    key = jax.random.PRNGKey(config.train.seed)
    k1, k2 = jax.random.split(key)

    if workload == "two_qubit":
        from ..training.systems import SU4System
        from .two_qubit import build_targets
        system = SU4System()
        trainer = Trainer(model, config.train, system=system)
        train_in = build_targets(k1, config.train_set_size, system.system)
        eval_in = build_targets(k2, config.eval_set_size, system.system)
        train_t, eval_t = train_in, eval_in
    else:
        train_in, train_t = build_su2_dataset(k1, config.train_set_size)
        eval_in, eval_t = build_su2_dataset(k2, config.eval_set_size,
                                            random=True)

    logger = MetricsLogger(
        path=(f"{config.save_path}/metrics.csv"
              if config.save_path else None),
        echo=True)
    with logger:
        params, history = trainer.train(
            train_in, train_t, eval_in, eval_t,
            curriculum=config.curriculum, save_dir=config.save_path,
            logger=logger)
    best = max(b["best_fid"] for b in history["bands"]
               if b.get("best_fid") is not None)
    print(f"done; best eval fidelity across bands: {best:.4f}")
    return best


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Config-driven training run")
    p.add_argument("config", type=str, help="RunConfig JSON with 'workload'")
    p.add_argument("--save_path", type=str, default=None)
    p.add_argument("--num_epoch", type=int, default=None)
    args = p.parse_args(argv)

    with open(args.config) as f:
        raw = json.load(f)
    workload = raw.pop("workload", "universal_single_qubit")
    config = RunConfig.from_dict(raw)
    if args.save_path is not None:
        config.save_path = args.save_path
    if args.num_epoch is not None:
        config.train = dataclasses.replace(config.train,
                                           epochs=args.num_epoch)
    run(config, workload)


if __name__ == "__main__":
    main()
