r"""Model-vs-SCORE parity figure — one command, all five named gates.

The reference's actual published evidence format is comparative robustness
figures: trained-model pulses against the analytic SCORE composites
("When compared to the SCORE4 pulse…", train/README.md).  This CLI
regenerates that comparison for OUR trained artifacts: per named gate
(visualize_universal_with_pipeline.py:77-85) it evaluates the model pulse
sequence and the analytic SCORE baseline on a common disorder sweep
(common random numbers) and emits one multi-panel figure plus a markdown
summary table.

Usage:
    python -m universal_quantum_optimal_control_tpu.analysis.parity_figure \
        --variant length_100 --out docs/model_vs_score
"""

from __future__ import annotations

import argparse
import math
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from ..data.su2_targets import named_gate_rotation_vectors
from .plots import fidelity_by_std, mc_fidelity_estimate
from .score_pulses import NAMED_SCORE_TARGETS, build_score_pulses

# named gate → SCORE composite spec (Y is SCORE-1 about φ = π/2; the four
# others are the published composites, reference visualize/util.py:56-61)
GATE_TO_SCORE = {
    "X": NAMED_SCORE_TARGETS["X(pi)"],
    "X(pi/2)": NAMED_SCORE_TARGETS["X(pi/2)"],
    "Y": [(1, 1 / 2)],
    "Z(pi/4)": NAMED_SCORE_TARGETS["Z(pi/4)"],
    "H": NAMED_SCORE_TARGETS["Hadamard"],
}


def gate_parity_curves(
    variant: str,
    checkpoint: Optional[str] = None,
    monte_carlo: int = 10000,
    stds=None,
    eval_delta_std: float = 1.0,
    epsilon_std: float = 0.05,
    seed: int = 0,
) -> Dict[str, Dict]:
    """Per-gate E[F](σ_δ) curves for the model variant and SCORE baseline."""
    from ..demo.app import compute_pulses

    score = build_score_pulses({k: v for k, v in GATE_TO_SCORE.items()})
    gates = named_gate_rotation_vectors()
    key = jax.random.PRNGKey(seed)

    results: Dict[str, Dict] = {}
    for name, rv in gates.items():
        rv = np.asarray(rv, np.float32)
        model_pulses, q_t = compute_pulses(
            variant, rv[0], rv[1], rv[2], rv[3], checkpoint=checkpoint)
        entry = {}
        for label, pulses in (("model", model_pulses),
                              ("SCORE", score[name])):
            s, mean, se = fidelity_by_std(
                pulses, q_t, stds=stds, epsilon_std=epsilon_std,
                monte_carlo=monte_carlo, key=key)  # common randoms
            ef, ef_se = mc_fidelity_estimate(
                pulses, q_t, delta_std=eval_delta_std,
                epsilon_std=epsilon_std, monte_carlo=monte_carlo, key=key)
            entry[label] = {
                "stds": s, "mean": mean, "se": se, "EF": ef, "EF_se": ef_se,
                "total_time_pi":
                    float(np.sum(np.asarray(pulses)[:, -1])) / math.pi,
            }
        results[name] = entry
    return results


def render(results: Dict[str, Dict], out_prefix: str,
           eval_delta_std: float = 1.0, title: str = "") -> Dict[str, str]:
    """Multi-panel figure + markdown table from :func:`gate_parity_curves`."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = Path(out_prefix)
    out.parent.mkdir(parents=True, exist_ok=True)

    n = len(results)
    fig, axes = plt.subplots(1, n, figsize=(3.2 * n, 3.4), sharey=True)
    for ax, (gate, entry) in zip(np.atleast_1d(axes), results.items()):
        for label, style in (("model", {"color": "C0"}),
                             ("SCORE", {"color": "C1", "ls": "--"})):
            e = entry[label]
            ax.plot(e["stds"], e["mean"], lw=1.5, label=label, **style)
            ax.fill_between(e["stds"], e["mean"] - e["se"],
                            e["mean"] + e["se"], alpha=0.2,
                            color=style["color"])
        ax.set_title(gate)
        ax.set_xlabel(r"$\sigma_\delta$")
        ax.grid(alpha=0.3)
    np.atleast_1d(axes)[0].set_ylabel("E[F]")
    np.atleast_1d(axes)[0].legend()
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    fig_path = f"{out_prefix}.png"
    fig.savefig(fig_path, dpi=130, bbox_inches="tight")
    plt.close(fig)

    md_path = f"{out_prefix}.md"
    with open(md_path, "w") as f:
        f.write(f"# Model vs SCORE analytic baselines {title}\n\n")
        f.write(f"E[F] at σ_δ = {eval_delta_std:g} (ε_std 0.05), "
                "common random numbers; T in π units.\n\n")
        f.write("| gate | model E[F] | SCORE E[F] | model T | SCORE T |\n")
        f.write("|---|---:|---:|---:|---:|\n")
        for gate, entry in results.items():
            m, sc = entry["model"], entry["SCORE"]
            f.write(f"| {gate} | {m['EF']:.4f}±{m['EF_se']:.4f} "
                    f"| {sc['EF']:.4f}±{sc['EF_se']:.4f} "
                    f"| {m['total_time_pi']:.2f}π "
                    f"| {sc['total_time_pi']:.2f}π |\n")
    return {"figure": fig_path, "table": md_path}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="model-vs-SCORE robustness parity figure")
    p.add_argument("--variant", default=None,
                   help="demo model variant (default: best shipped)")
    p.add_argument("--checkpoint", default=None, help="'dir:tag' or .npz")
    p.add_argument("--out", default="docs/model_vs_score")
    p.add_argument("--monte_carlo", type=int, default=10000)
    p.add_argument("--eval_delta_std", type=float, default=1.0)
    args = p.parse_args(argv)

    from ..demo.app import default_variant
    variant = args.variant or default_variant()
    results = gate_parity_curves(variant, checkpoint=args.checkpoint,
                                 monte_carlo=args.monte_carlo,
                                 eval_delta_std=args.eval_delta_std)
    paths = render(results, args.out, eval_delta_std=args.eval_delta_std,
                   title=f"({variant})")
    for k, v in paths.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
