r"""Combined robustness figure for the two-qubit per-gate bundle.

One plot: ``E[F](σ_δ)`` for every gate table in
``demo/weights/two_qubit_gates.npz`` (drive2 system, i.i.d. per-qubit
off-resonance draws, ε_std = 0.05) — the SU(4) analog of the single-qubit
model-vs-SCORE parity figure (:mod:`.parity_figure`), making the shipped
artifact's robustness legible at a glance the way the reference's
fidelity-vs-σ sweeps do (reference visualize/util.py:305-418).

Usage:
    python -m universal_quantum_optimal_control_tpu.analysis.two_qubit_bundle_figure \
        --out docs/two_qubit_gates_bundle.png [--monte_carlo 2000]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np

from ..core import su4
from ..workloads.finetune_two_qubit_gates import load_two_qubit_gate_bundle
from .plots_su4 import fidelity_by_std_su4

__all__ = ["main", "render_bundle_figure"]

_DEFAULT_BUNDLE = str(Path(__file__).parent.parent / "demo" / "weights"
                      / "two_qubit_gates.npz")


def render_bundle_figure(bundle_path: str, out_path: str, *,
                         monte_carlo: int = 2000,
                         stds=None, epsilon_std: float = 0.05,
                         seed: int = 0) -> dict:
    """Render the combined E[F](σ_δ) sweep for every bundle gate.

    Returns ``{gate: (stds, mean, se)}`` for testing/inspection.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..optimizers.two_qubit_grape import named_two_qubit_targets

    tables, meta = load_two_qubit_gate_bundle(bundle_path)
    system = su4.TwoQubitSystem(drive2=bool(meta.get("drive2", False)))
    gates = named_two_qubit_targets()
    stds = np.asarray(stds if stds is not None
                      else np.arange(0.05, 0.65, 0.05), np.float32)

    fig, ax = plt.subplots(figsize=(7.0, 5.0))
    curves = {}
    for i, g in enumerate(meta["gates"]):
        s, mean, se = fidelity_by_std_su4(
            tables[g], gates[g], system, stds=stds,
            epsilon_std=epsilon_std, monte_carlo=monte_carlo,
            key=jax.random.PRNGKey(seed))
        curves[g] = (s, mean, se)
        ax.errorbar(s, mean, yerr=se, marker="o", ms=3, lw=1.2,
                    capsize=2, label=g)
    ax.set_xlabel(r"$\sigma_\delta$ (per-qubit off-resonance std)")
    ax.set_ylabel(r"$E[F]$")
    ax.set_ylim(0.4, 1.005)
    ax.grid(alpha=0.3)
    ax.legend(title="gate", loc="lower left")
    ax.set_title(f"two-qubit per-gate bundle robustness "
                 f"(drive2, ε_std={epsilon_std}, M={monte_carlo})")
    fig.tight_layout()
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return curves


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="Render the two-qubit gate-bundle robustness figure")
    p.add_argument("--bundle", default=_DEFAULT_BUNDLE)
    p.add_argument("--out", default="docs/two_qubit_gates_bundle.png")
    p.add_argument("--monte_carlo", type=int, default=2000)
    p.add_argument("--epsilon_std", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    curves = render_bundle_figure(
        args.bundle, args.out, monte_carlo=args.monte_carlo,
        epsilon_std=args.epsilon_std, seed=args.seed)
    for g, (s, mean, _) in curves.items():
        print(g, {round(float(a), 2): round(float(b), 4)
                  for a, b in zip(s[::4], mean[::4])})
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
