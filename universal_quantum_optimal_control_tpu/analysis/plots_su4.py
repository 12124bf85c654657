r"""Two-qubit analysis plots — SU(4) fidelity surfaces and disorder sweeps.

The single-qubit contour plots sweep (δ, ε); the two-qubit system has two
off-resonance channels, so the natural robustness surface is F(δ₁, δ₂) at
fixed ε (plus an E[F](σ_δ) sweep with both channels drawn i.i.d.).  No
reference equivalent exists (the reference ships no two-qubit code); figure
semantics mirror the single-qubit suite.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import su4
from .plots import CONTOUR_LEVELS, LINE_LEVELS

__all__ = ["fidelity_grid_su4", "fidelity_contour_plot_su4",
           "fidelity_by_std_su4"]


def _as_packed(u_target) -> Tuple[jax.Array, jax.Array]:
    # complex split on HOST numpy: eager complex ops are unimplemented on
    # some remote-device backends (same rationale as SU4System.pack_target)
    u = np.asarray(u_target)
    if u.ndim == 3 and u.shape[0] == 2:  # packed (2, 4, 4)
        return (jnp.asarray(u[0], jnp.float32),
                jnp.asarray(u[1], jnp.float32))
    return (jnp.asarray(u.real, jnp.float32),
            jnp.asarray(u.imag, jnp.float32))


from functools import partial


@partial(jax.jit, static_argnames=("xtalk", "coupling", "drive2"))
def _grid_fid_su4(pulses, tr, ti, d1g, d2g, eps, xtalk, coupling,
                  drive2=False):
    dd1, dd2 = jnp.meshgrid(d1g, d2g, indexing="ij")
    system = su4.TwoQubitSystem(xtalk=xtalk, coupling=coupling,
                                drive2=drive2)
    Ur, Ui = su4.propagate_su4(pulses[None, None], dd1, dd2,
                               jnp.broadcast_to(eps, dd1.shape), system)
    return su4.fidelity_su4_ri(Ur, Ui, tr, ti)


def fidelity_grid_su4(pulses, u_target,
                      system: su4.TwoQubitSystem = su4.TwoQubitSystem(),
                      delta_range: Tuple[float, float] = (-1.5, 1.5),
                      n_delta: int = 101, epsilon: float = 0.0):
    """Deterministic F(δ₁, δ₂) surface at fixed ε."""
    tr, ti = _as_packed(u_target)
    dg = jnp.linspace(*delta_range, n_delta)
    F = _grid_fid_su4(jnp.asarray(pulses), tr, ti, dg, dg,
                      jnp.float32(epsilon), system.xtalk, system.coupling,
                      system.drive2)
    return np.asarray(dg), np.asarray(F)


def fidelity_contour_plot_su4(pulses, u_target,
                              system: su4.TwoQubitSystem = su4.TwoQubitSystem(),
                              save_path: Optional[str] = None,
                              title: str = "", n_delta: int = 101):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    dg, F = fidelity_grid_su4(pulses, u_target, system, n_delta=n_delta)
    fig, ax = plt.subplots(figsize=(6.5, 5.5))
    cs = ax.contourf(dg, dg, F.T, levels=[0.0] + CONTOUR_LEVELS,
                     cmap="viridis")
    ax.contour(dg, dg, F.T, levels=LINE_LEVELS, colors="white",
               linewidths=0.8)
    fig.colorbar(cs, ax=ax, label="fidelity")
    ax.set_xlabel(r"$\delta_1$")
    ax.set_ylabel(r"$\delta_2$")
    ax.set_title(f"{title}  two-qubit fidelity surface")
    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


@partial(jax.jit, static_argnames=("xtalk", "coupling", "drive2"))
def _sweep_su4(pulses, tr, ti, n1, n2, ne, stds, xtalk, coupling,
               drive2=False):
    system = su4.TwoQubitSystem(xtalk=xtalk, coupling=coupling,
                                drive2=drive2)
    d1 = (n1 * stds[:, None]).reshape(1, -1)
    d2 = (n2 * stds[:, None]).reshape(1, -1)
    Ur, Ui = su4.propagate_su4_mc(pulses[None], d1, d2, ne.reshape(1, -1),
                                  system)
    F = su4.fidelity_su4_ri(Ur, Ui, tr, ti).reshape(stds.shape[0], -1)
    return jnp.mean(F, axis=1), jnp.std(F, axis=1) / jnp.sqrt(F.shape[1])


def fidelity_by_std_su4(pulses, u_target,
                        system: su4.TwoQubitSystem = su4.TwoQubitSystem(),
                        stds: Optional[Sequence[float]] = None,
                        epsilon_std: float = 0.05, monte_carlo: int = 2000,
                        key: Optional[jax.Array] = None):
    """``E[F](σ_δ)`` with i.i.d. per-qubit off-resonance draws."""
    stds = jnp.asarray(stds if stds is not None
                       else np.arange(0.05, 1.5, 0.05), jnp.float32)
    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    S = stds.shape[0]
    n1 = jax.random.normal(k1, (S, monte_carlo))
    n2 = jax.random.normal(k2, (S, monte_carlo))
    ne = jax.random.normal(k3, (S, monte_carlo)) * epsilon_std
    tr, ti = _as_packed(u_target)
    mean, se = _sweep_su4(jnp.asarray(pulses), tr, ti, n1, n2, ne, stds,
                          system.xtalk, system.coupling, system.drive2)
    return np.asarray(stds), np.asarray(mean), np.asarray(se)
