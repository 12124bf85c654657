r"""Side-by-side robustness comparison of pulse strategies.

The reference's headline qualitative claim is comparative — "the transformer
pulse beats SCORE4: higher fidelity and shorter pulse duration"
(train/README.md) — but it ships no tool to produce that comparison.  This
module evaluates any set of named pulse sequences against one target on a
common disorder sweep (common random numbers, one device program per
strategy) and emits a combined figure + summary table.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np

from .plots import fidelity_by_std, mc_fidelity_estimate

__all__ = ["compare_pulse_strategies"]


def compare_pulse_strategies(
    strategies: Dict[str, np.ndarray],
    u_target,
    stds: Optional[Sequence[float]] = None,
    epsilon_std: float = 0.05,
    monte_carlo: int = 10000,
    eval_delta_std: float = 1.0,
    save_path: Optional[str] = None,
    key: Optional[jax.Array] = None,
    title: str = "",
):
    """Compare pulse sequences on E[F](σ_δ) curves + a summary table.

    Args:
      strategies: name → pulses ``(L, 2)``.
      u_target: target unitary (complex 2×2) or quaternion.
    Returns:
      ``(summary, fig)`` where summary is name → dict(EF at eval σ, SE,
      total time in π units, curve arrays).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    summary = {}
    curves = {}
    for name, pulses in strategies.items():
        s, mean, se = fidelity_by_std(
            pulses, u_target, stds=stds, epsilon_std=epsilon_std,
            monte_carlo=monte_carlo, key=key)  # same key ⇒ common randoms
        ef, ef_se = mc_fidelity_estimate(
            pulses, u_target, delta_std=eval_delta_std,
            epsilon_std=epsilon_std, monte_carlo=monte_carlo, key=key)
        total_time = float(np.sum(np.asarray(pulses)[:, 1])) / np.pi
        summary[name] = {
            "EF": ef, "EF_se": ef_se, "total_time_pi": total_time,
            "stds": s, "mean": mean, "se": se,
        }
        curves[name] = (s, mean, se)

    fig = None
    if save_path is not None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 4.5))
        for name, (s, mean, se) in curves.items():
            ax1.plot(s, mean, lw=1.5, label=name)
            ax1.fill_between(s, mean - se, mean + se, alpha=0.2)
            ax2.loglog(s, np.clip(1 - mean, 1e-8, None), lw=1.5, label=name)
        ax1.set_xlabel(r"$\sigma_\delta$")
        ax1.set_ylabel("E[F]")
        ax1.set_title(f"{title} robustness")
        ax1.legend()
        ax2.set_xlabel(r"$\sigma_\delta$")
        ax2.set_ylabel("infidelity")
        ax2.set_title(f"{title} infidelity (log-log)")
        ax2.legend()
        lines = [f"{n}: E[F]@σ={eval_delta_std:g} = "
                 f"{v['EF']:.4f}±{v['EF_se']:.4f}, T = "
                 f"{v['total_time_pi']:.2f}π" for n, v in summary.items()]
        fig.suptitle("\n".join(lines), fontsize=8, y=1.08)
        fig.tight_layout()
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return summary, fig
