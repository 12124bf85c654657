r"""First-order Magnus / filter-function bound for two-qubit δ₂ dephasing.

Makes the round-2 empirical claim — that the two-qubit robustness plateau is
pulse-space physics, not an optimizer failure — analytic and falsifiable
(VERDICT r2: "a 'fundamental ceiling' claim that drives the roadmap deserves
the analytic bound").

Derivation
----------
System (BASELINE configs[4]): ``H = ½δ₁Z₁ + ½δ₂Z₂ + J·Z₁Z₂ + H_d(t)`` with
``H_d = a(t)(cosφ X₁ + sinφ Y₁) + χ·a(t)(cosφ X₂ + sinφ Y₂)``,
``a = ½(1+ε)Ω``.  The δ₂ error term ``½δ₂Z₂`` **commutes with every other
term except the χ-scaled cross-talk drive** (Z₂ commutes with Z₁, Z₁Z₂, and
all of qubit 1's operators).  In the toggling frame of the ideal evolution
the first-order Magnus error from δ₂ is

    Φ = δ₂/2 · ∫₀ᵀ ẑ(t) dt ,   ẑ(t) = Z₂ conjugated by the frame,

and ẑ(t) is rotated ONLY by the cross-talk drive, at instantaneous angular
rate ``2·χ·a(t) = χ(1+ε)Ω(t)``.  The frame angle after time t is therefore
at most ``χΩ̄t``, so ``ẑ(t)·ẑ(0) ≥ cos(χΩ̄t)`` and (while ``χΩ̄T ≤ π``)

    |∫₀ᵀ ẑ dt| ≥ sin(χΩ̄T)/(χΩ̄)  ≡  T_eff .

No pulse in the space can refocus δ₂ below this: the *effective* dephasing
time can be shortened from T by at most the factor sin(x)/x, x = χΩ̄T.
With χ = 0.1, Ω ≤ 1 and the L=40, τ∈(0.1,0.5) budget (T ≤ 20 < π/χΩ̄),
δ₂ is structurally unrefocusable — exactly the round-2 claim.

A pure one-qubit dephasing ``E = exp(−i·θ/2·Z₂)``, θ = δ₂·T_eff, has
entanglement fidelity ``F = (|Tr E|² + 4)/20 = (4cos²(θ/2) + 1)/5``; for
``δ₂ ~ N(0, σ²)``, using ``E[cos θ] = exp(−σ²T_eff²/2)``:

    E[F](σ) = (3 + 2·exp(−σ²·T_eff²/2)) / 5 .                       (*)

Every pulse of total duration T obeys ``E[F under δ₂ only] ≲ (*) with
T_eff = sin(χΩ̄T)/(χΩ̄)`` (equality when the pulse makes no attempt to
refocus, up to O((χΩ̄T)²) bending and O(σ³) corrections); the full-disorder
fidelity further multiplies in the δ₁/ε channel losses.

This module measures the shipped artifacts against (*):

1. the universal two-qubit model's pulses on its own target distribution,
   δ₂-only disorder vs the formula at the pulses' measured mean T;
2. the CZ GRAPE pulse (``demo/weights/cz_robust_pulse.npz``) the same way;
3. the full-disorder curve vs ``F₀ · (*)`` with F₀ = E[F at σ_δ₂ = 0]
   (the independent-channel factorization).

Reference: the reference ships no two-qubit code (README.md:87); the bound
formalism is standard filter-function/Magnus analysis.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..training.systems import SU4System

__all__ = ["dephasing_bound", "effective_time", "main"]

_WEIGHTS = Path(__file__).parent.parent / "demo" / "weights"


def effective_time(T, chi: float, omega_bar: float = 1.0):
    """Minimal effective dephasing time: ``sin(χΩ̄T)/(χΩ̄)`` for
    ``χΩ̄T ≤ π/2`` (monotone branch), clamped to its maximum beyond."""
    x = chi * omega_bar
    return np.sin(np.minimum(np.asarray(T) * x, 0.5 * np.pi)) / x


def dephasing_bound(sigma, T_eff):
    """(*) — expected entanglement fidelity of unrefocused δ₂ dephasing."""
    s = np.asarray(sigma, np.float64)
    return (3.0 + 2.0 * np.exp(-0.5 * s * s * np.asarray(T_eff) ** 2)) / 5.0


def _model_pulses(checkpoint: str, n_targets: int, seed: int):
    from ..workloads.two_qubit import build_targets
    from ..workloads.two_qubit_eval import model_gate_pulses

    system = SU4System()
    targets = build_targets(jax.random.PRNGKey(seed), n_targets,
                            system.system)
    pulses = model_gate_pulses(checkpoint, targets)
    return pulses, targets


def _mean_fid(pulses, targets, d1, d2, ep, system):
    return float(jnp.mean(system.local_mean_fidelity(
        pulses, targets, (d1, d2, ep))))


def measure(pulses, targets, sigmas, *, monte_carlo=20_000,
            epsilon_std=0.05, seed=11):
    """Rows of (σ, measured δ₂-only E[F], bound, full E[F], F₀·bound)."""
    system = SU4System()
    B = pulses.shape[0]
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    n1 = jax.random.normal(k1, (B, monte_carlo))
    n2 = jax.random.normal(k2, (B, monte_carlo))
    ne = jax.random.normal(k3, (B, monte_carlo))
    zero = jnp.zeros_like(n1)

    T = np.asarray(jnp.sum(pulses[..., -1], axis=-1))
    omega_bar = (float(jnp.mean(jnp.maximum(pulses[..., 1], 0.0)))
                 if pulses.shape[-1] == 3 else 1.0)
    T_eff = effective_time(T.mean(), system.system.xtalk, omega_bar)
    # F0: δ₁/ε channels only (δ₂ = 0) — the non-δ₂ loss factor
    F0 = {}
    rows = []
    for s in sigmas:
        f_d2 = _mean_fid(pulses, targets, zero, n2 * s, zero, system)
        f_full = _mean_fid(pulses, targets, n1 * s, n2 * s,
                           ne * epsilon_std, system)
        F0[s] = _mean_fid(pulses, targets, n1 * s, zero, ne * epsilon_std,
                          system)
        bound = float(dephasing_bound(s, T_eff))
        rows.append((s, f_d2, bound, f_full, F0[s] * bound))
    return rows, T.mean(), T_eff, omega_bar


def _render(name, rows, T, T_eff, omega_bar):
    out = [f"### {name}  (mean T = {T:.2f}, Ω̄ = {omega_bar:.2f}, "
           f"T_eff = {T_eff:.2f})", "",
           "| σ_δ | E[F] δ₂ only | bound (*) | E[F] full | F₀·bound |",
           "|---|---:|---:|---:|---:|"]
    for s, f2, b, ff, fb in rows:
        out.append(f"| {s:g} | {f2:.4f} | {b:.4f} | {ff:.4f} | {fb:.4f} |")
    return "\n".join(out)


def build_parser():
    p = argparse.ArgumentParser(
        description="Magnus/filter-function δ₂ dephasing bound vs shipped "
                    "two-qubit artifacts")
    p.add_argument("--checkpoint",
                   default=str(_WEIGHTS / "two_qubit_d512.npz"))
    p.add_argument("--cz", default=str(_WEIGHTS / "cz_robust_pulse.npz"))
    p.add_argument("--sigmas", default="0.05,0.1,0.2,0.4")
    p.add_argument("--n_targets", type=int, default=32)
    p.add_argument("--monte_carlo", type=int, default=20_000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    sigmas = [float(s) for s in args.sigmas.split(",")]
    sections = ["# δ₂ dephasing bound vs measurement", "",
                "Formula (*): E[F] = (3 + 2·exp(−σ²T_eff²/2))/5 with "
                "T_eff = sin(χΩ̄T)/(χΩ̄) — see "
                "`analysis/dephasing_bound.py` for the derivation.", ""]

    if Path(args.checkpoint).exists():
        pulses, targets = _model_pulses(args.checkpoint, args.n_targets,
                                        args.seed)
        rows, T, T_eff, ob = measure(pulses, targets, sigmas,
                                     monte_carlo=args.monte_carlo)
        sections.append(_render(
            f"universal model `{Path(args.checkpoint).name}` "
            f"({args.n_targets} random targets)", rows, T, T_eff, ob))
        sections.append("")

    if Path(args.cz).exists():
        z = np.load(args.cz)
        pulses = jnp.asarray(z["pulses"])[None]
        U = np.asarray(z["u_target"])[None]
        targets = SU4System.pack_target(U)
        rows, T, T_eff, ob = measure(pulses, targets, sigmas,
                                     monte_carlo=args.monte_carlo)
        sections.append(_render(f"CZ GRAPE pulse `{Path(args.cz).name}`",
                                rows, T, T_eff, ob))

    text = "\n".join(sections)
    print(text)
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(text + "\n")


if __name__ == "__main__":
    main()
