r"""Offline visualization driver — full analysis suite over named gates.

TPU-native equivalent of visualize/visualize_universal_with_pipeline.py:
loads a trained universal model, synthesizes pulses for the five named gates
(X, X(π/2), Y, Z(π/4), H — reference :77-85), and emits per gate: pulse CSV,
fidelity contour plot, pulse-parameter plot, fidelity-vs-σ sweep, and a
Bloch-ensemble evolution video.

Usage:
    python -m universal_quantum_optimal_control_tpu.analysis.visualize_universal \
        --checkpoint weights/single_qubit_control:band2_delta1_eps0.05 \
        [--config .../universal_single_qubit.json] --out viz/
    (--random-init runs without a checkpoint, e.g. for smoke testing)
"""

from __future__ import annotations

import argparse
import csv
from pathlib import Path

import jax
import numpy as np

from ..core.su2 import rotation_vector_to_quat
from ..data import named_gate_rotation_vectors
from ..models import Pipeline, UniversalQOCTransformer, normalize_pulse_space
from ..training.checkpoint import restore_checkpoint
from ..utils import load_model_params
from .bloch import animate_bloch_ensemble
from .plots import fidelity_contour_plot, plot_fidelity_by_std, plot_pulse_param

DEFAULT_CONFIG = str(Path(__file__).parent.parent / "configs"
                     / "universal_single_qubit.json")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Visualize universal QOC model")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="'base_dir:tag' of a saved checkpoint")
    p.add_argument("--config", type=str, default=DEFAULT_CONFIG)
    p.add_argument("--out", type=str, default="viz")
    p.add_argument("--monte_carlo", type=int, default=10000)
    p.add_argument("--random-init", action="store_true",
                   help="run with randomly initialized weights")
    p.add_argument("--gates", type=str, default=None,
                   help="comma-separated subset of gate names")
    p.add_argument("--skip-video", action="store_true")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    model_params = load_model_params(args.config)
    model_params["pulse_space"] = normalize_pulse_space(
        model_params["pulse_space"])
    model_params["finetune"] = bool(model_params.get("finetune"))
    model = UniversalQOCTransformer(**model_params)

    gates = named_gate_rotation_vectors()
    if args.gates:
        wanted = [g.strip() for g in args.gates.split(",")]
        unknown = [g for g in wanted if g not in gates]
        if unknown:
            raise SystemExit(
                f"unknown gate(s) {unknown}; available: {sorted(gates)}")
        gates = {k: v for k, v in gates.items() if k in wanted}

    sample_rv = next(iter(gates.values()))[None]
    if args.random_init and args.checkpoint is None:
        params = model.init(jax.random.PRNGKey(0), sample_rv)
    else:
        if args.checkpoint is None:
            raise SystemExit("--checkpoint or --random-init required")
        base_dir, tag = args.checkpoint.rsplit(":", 1)
        target = model.init(jax.random.PRNGKey(0), sample_rv)
        params, _ = restore_checkpoint(base_dir, tag, target=target)

    pipe = Pipeline(model, params)

    for name, rv in gates.items():
        safe = name.replace("/", "-").replace("(", "_").replace(")", "")
        pulses = np.asarray(pipe(rv[None])[0])
        q_target = rotation_vector_to_quat(rv)

        with open(out / f"{safe}_pulses.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["phi", "tau"])
            w.writerows(pulses.tolist())

        fidelity_contour_plot(pulses, q_target,
                              save_path=str(out / f"{safe}_contour.png"),
                              title=name, monte_carlo=args.monte_carlo)
        plot_pulse_param(pulses, save_path=str(out / f"{safe}_params.png"),
                         title=name)
        plot_fidelity_by_std(pulses, q_target,
                             save_prefix=str(out / safe),
                             title=name, monte_carlo=args.monte_carlo)
        if not args.skip_video:
            animate_bloch_ensemble(pulses, q_target, n_samples=12,
                                   save_path=str(out / f"{safe}_evolution.mp4"),
                                   title=name)
        print(f"{name}: artifacts written under {out}/")


if __name__ == "__main__":
    main()
