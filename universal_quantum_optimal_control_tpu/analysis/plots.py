r"""Analysis plots: fidelity contours, fidelity-vs-σ sweeps, pulse parameters.

TPU-native rebuild of visualize/util.py's plotting suite: the Monte-Carlo and
grid evaluations are single jitted/vmapped device programs (the reference
loops batched torch ops per grid chunk); matplotlib renders the same figure
semantics — filled contour levels {0.8, 0.9, 0.95, 0.99, 0.999, 1.0} with
white lines at {0.95, 0.99, 0.999} (util.py:258-259), E[F] ± SE annotations
at M=10000 (util.py:214, 227-228), δ_std sweep over [0.01, 2.0) step 0.01
(util.py:313), piecewise-linear robustness fits (util.py:336-403).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core import su2
from ..core.propagate import propagate_mc, propagate_scan
from .fits import piecewise_linear_eval, segmented_linear_fit

__all__ = [
    "mc_fidelity_estimate",
    "fidelity_grid",
    "fidelity_contour_plot",
    "fidelity_by_std",
    "plot_fidelity_by_std",
    "plot_pulse_param",
]


def _as_target_quat(u_target) -> jax.Array:
    u = jnp.asarray(u_target)
    if u.ndim >= 2 and u.shape[-1] == 2 and u.shape[-2] == 2:
        return su2.su2_to_quat(u.astype(jnp.complex64))
    return u.astype(jnp.float32)


@jax.jit
def _mc_stats(pulses, q_target, delta, eps):
    q = propagate_mc(pulses[None], delta[None], eps[None])[0]
    F = su2.quat_fidelity(q, q_target[None])
    return jnp.mean(F), jnp.std(F) / jnp.sqrt(F.shape[0])


def mc_fidelity_estimate(pulses, u_target, delta_std: float = 1.0,
                         epsilon_std: float = 0.05, monte_carlo: int = 10000,
                         key: Optional[jax.Array] = None) -> Tuple[float, float]:
    """``E[F] ± SE`` under gaussian disorder (reference util.py:209-228)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    delta = jax.random.normal(k1, (monte_carlo,)) * delta_std
    eps = jax.random.normal(k2, (monte_carlo,)) * epsilon_std
    mean, se = _mc_stats(jnp.asarray(pulses), _as_target_quat(u_target),
                         delta, eps)
    return float(mean), float(se)


@jax.jit
def _grid_fid(pulses, q_target, delta_grid, eps_grid):
    dd, ee = jnp.meshgrid(delta_grid, eps_grid, indexing="ij")
    q = propagate_scan(pulses[None, None], dd, ee)
    return su2.quat_fidelity(q, q_target[None, None])


def fidelity_grid(pulses, u_target,
                  delta_range: Tuple[float, float] = (-3.0, 3.0),
                  eps_range: Tuple[float, float] = (-0.15, 0.15),
                  n_delta: int = 1000, n_eps: int = 50):
    """Deterministic F(δ, ε) surface (reference util.py:231-252)."""
    dg = jnp.linspace(*delta_range, n_delta)
    eg = jnp.linspace(*eps_range, n_eps)
    F = _grid_fid(jnp.asarray(pulses), _as_target_quat(u_target), dg, eg)
    return np.asarray(dg), np.asarray(eg), np.asarray(F)


CONTOUR_LEVELS = [0.8, 0.9, 0.95, 0.99, 0.999, 1.0]
LINE_LEVELS = [0.95, 0.99, 0.999]


def fidelity_contour_plot(pulses, u_target, save_path: Optional[str] = None,
                          title: str = "", monte_carlo: int = 10000,
                          delta_std: float = 1.0, epsilon_std: float = 0.05):
    """Filled fidelity contours over the (δ, ε) grid with the MC-estimated
    E[F] ± SE and total evolution time (π units) in the title
    (reference util.py:209-271)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    dg, eg, F = fidelity_grid(pulses, u_target)
    mean, se = mc_fidelity_estimate(pulses, u_target, delta_std, epsilon_std,
                                    monte_carlo)
    total_time = float(np.sum(np.asarray(pulses)[:, 1])) / math.pi

    fig, ax = plt.subplots(figsize=(8, 5))
    cs = ax.contourf(dg, eg, F.T, levels=[0.0] + CONTOUR_LEVELS,
                     cmap="viridis")
    ax.contour(dg, eg, F.T, levels=LINE_LEVELS, colors="white",
               linewidths=0.8)
    fig.colorbar(cs, ax=ax, label="fidelity")
    ax.set_xlabel(r"off-resonant error $\delta$")
    ax.set_ylabel(r"pulse-length error $\epsilon$")
    ax.set_title(f"{title}  E[F] = {mean:.4f} ± {se:.4f}, "
                 f"T = {total_time:.2f}π")
    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig, (mean, se)


@jax.jit
def _sweep_fid(pulses, q_target, normals_d, normals_e, stds):
    # normals: (S, M) standard draws reused across stds (common random
    # numbers -> smooth curves); stds: (S,).  lax.map over the std axis keeps
    # the per-step segment materialization at O(M·L) instead of O(S·M·L)
    # (the flat version OOMs at the reference sweep scale: 199 σ × 10k MC ×
    # L=100 needs ~24 GB of segment quaternions on a 16 GB chip)
    def one_std(args):
        nd, ne, s = args
        q = propagate_mc(pulses[None], (nd * s)[None], ne[None])[0]
        F = su2.quat_fidelity(q, q_target[None])
        return jnp.mean(F), jnp.std(F) / jnp.sqrt(F.shape[0])

    return lax.map(one_std, (normals_d, normals_e, stds))


def fidelity_by_std(pulses, u_target,
                    stds: Optional[Sequence[float]] = None,
                    epsilon_std: float = 0.05, monte_carlo: int = 10000,
                    key: Optional[jax.Array] = None):
    """``E[F](σ_δ)`` sweep — reference sweep domain δ_std ∈ [0.01, 2.0) step
    0.01, ε_std = 0.05, M = 10000 (util.py:313-326).  The whole sweep is ONE
    device program (199 × M propagations)."""
    stds = jnp.asarray(stds if stds is not None
                       else np.arange(0.01, 2.0, 0.01), jnp.float32)
    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    nd = jax.random.normal(k1, (stds.shape[0], monte_carlo))
    ne = jax.random.normal(k2, (stds.shape[0], monte_carlo)) * epsilon_std
    mean, se = _sweep_fid(jnp.asarray(pulses), _as_target_quat(u_target),
                          nd, ne, stds)
    return np.asarray(stds), np.asarray(mean), np.asarray(se)


def plot_fidelity_by_std(pulses, u_target, save_prefix: Optional[str] = None,
                         title: str = "", monte_carlo: int = 10000,
                         epsilon_std: float = 0.05):
    """Robustness curve + fits: 2-segment piecewise-linear fit of F(σ) and
    3-segment log-log fit of the infidelity (reference util.py:305-418).

    Saves ``{prefix}_fidelity.png`` and ``{prefix}_infidelity_with_fit.png``.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    stds, mean, se = fidelity_by_std(pulses, u_target,
                                     monte_carlo=monte_carlo,
                                     epsilon_std=epsilon_std)

    fig1, ax = plt.subplots(figsize=(7, 4.5))
    ax.plot(stds, mean, lw=1.5, label="E[F]")
    ax.fill_between(stds, mean - se, mean + se, alpha=0.3)
    coef, breaks, yhat = segmented_linear_fit(stds, mean, n_segments=2)
    ax.plot(stds, piecewise_linear_eval(stds, coef, breaks), "--",
            label=f"2-seg fit (break at σ={breaks[0]:.2f})")
    ax.set_xlabel(r"$\sigma_\delta$")
    ax.set_ylabel("E[F]")
    ax.set_title(f"{title} fidelity vs disorder")
    ax.legend()
    fig1.tight_layout()

    infid = np.clip(1.0 - mean, 1e-8, None)
    lx, ly = np.log10(stds), np.log10(infid)
    coef3, breaks3, _ = segmented_linear_fit(lx, ly, n_segments=3,
                                             max_candidates=40)
    fig2, ax2 = plt.subplots(figsize=(7, 4.5))
    ax2.loglog(stds, infid, lw=1.5, label="1 − E[F]")
    ax2.loglog(stds, 10 ** piecewise_linear_eval(lx, coef3, breaks3), "--",
               label="3-seg log-log fit")
    ax2.set_xlabel(r"$\sigma_\delta$")
    ax2.set_ylabel("infidelity")
    ax2.set_title(f"{title} infidelity (log-log)")
    ax2.legend()
    fig2.tight_layout()

    if save_prefix is not None:
        fig1.savefig(f"{save_prefix}_fidelity.png", dpi=120)
        fig2.savefig(f"{save_prefix}_infidelity_with_fit.png", dpi=120)
        plt.close(fig1)
        plt.close(fig2)
    return (stds, mean, se), (fig1, fig2)


def plot_pulse_param(pulses, save_path: Optional[str] = None,
                     title: str = ""):
    """Histogram of pulse durations + step plot of φ over cumulative rotation
    time in π units (reference util.py:154-201)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    p = np.asarray(pulses)
    # channel convention across P ∈ {2, 3, 4}: φ first, τ last
    phi, tau = p[:, 0], p[:, -1]
    t_cum = np.concatenate([[0.0], np.cumsum(tau)]) / math.pi

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    ax1.hist(tau, bins=30)
    ax1.set_xlabel(r"pulse duration $\tau$")
    ax1.set_ylabel("count")
    ax1.set_title(f"{title} durations")
    ax2.step(t_cum, np.concatenate([phi, phi[-1:]]), where="post")
    ax2.set_xlabel(r"cumulative time ($\pi$ units)")
    ax2.set_ylabel(r"$\phi$")
    ax2.set_title(f"{title} phase schedule")
    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig
