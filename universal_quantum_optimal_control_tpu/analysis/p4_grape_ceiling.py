r"""Single-target GRAPE ceiling of the 4-parameter pulse space — CLI.

Round 3 shipped the P=4 per-gate bundle (`length100_gates_p4.npz`,
0.9630–0.9643 at σ_δ = 1) by polishing the P=4 universal model's own pulse
tables, and beat the measured P=2 single-target ceiling (0.9536–0.9558) —
but no P=4 *single-target* ceiling was ever measured, so nobody knows
whether 0.964 is the top of the P=4 space or just the top of the model's
basin.  This CLI measures it the way a ceiling should be measured:
multi-start GRAPE from RANDOM pulse tables (no model prior), a σ_δ
curriculum (direct ascent at σ = 1 from random init collapses), joint
batched optimization of all (gate × start) tables through the fused SU(2)
Pallas objective, and a converged 200k-MC eval of the best start per gate.

Reference: GRAPE-as-baseline role (train/GRAPE/grape_train.py:269-323);
the curriculum mirrors its δ_std ∈ {0.4, 0.7, 1.0} bands (:304).

Usage::

    python -m universal_quantum_optimal_control_tpu.analysis.p4_grape_ceiling \
        [--starts 16] [--num_pulses 100] [--out docs/p4_ceiling.md]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..core.su2 import rotation_vector_to_quat
from ..data import named_gate_rotation_vectors
from ..models import normalize_pulse_space
from ..workloads.finetune_gates import (
    evaluate_tables,
    finetune_pulse_tables,
)

__all__ = ["main", "measure_ceiling"]

# the reference's declared 4-parameter space (test.py:16-18) at the
# shipped flagship's ranges (configs/universal_single_qubit_length100.json
# + the round-3 P=4 additions: Δ ∈ ±5, Ω ∈ [0, 1])
P4_SPACE = {"Delta": (-5.0, 5.0), "Omega": (0.0, 1.0),
            "phi": (-3.15, 3.15), "tau": (0.1, 0.5)}


def measure_ceiling(*, starts=16, num_pulses=100, monte_carlo=4096,
                    eval_mc=200_000, learning_rate=3e-3, seed=0,
                    curriculum=((0.4, 800), (0.7, 800), (1.0, 1500)),
                    epsilon_std=0.05, backend="pallas", gates=None):
    """Best-of-``starts`` random-init P=4 GRAPE per named gate at σ_δ = 1.

    Returns ``(rows, pulses_by_gate)`` with rows of
    ``(gate, ceiling E[F], mean-over-starts E[F], best start index)``.
    """
    space = normalize_pulse_space(P4_SPACE)
    names = list(gates or named_gate_rotation_vectors().keys())
    rvecs = named_gate_rotation_vectors()
    q_t = jnp.stack([rotation_vector_to_quat(jnp.asarray(rvecs[g]))
                     for g in names])                      # (G, 4)
    G, S, L, P = len(names), starts, num_pulses, len(space)

    key = jax.random.PRNGKey(seed)
    low = jnp.asarray([lo for _, (lo, _) in space], jnp.float32)
    high = jnp.asarray([hi for _, (_, hi) in space], jnp.float32)
    u = jax.random.uniform(key, (G * S, L, P), minval=0.05, maxval=0.95)
    pulses = low + (high - low) * u
    q_rep = jnp.repeat(q_t, S, axis=0)                     # (G·S, 4)

    for band, (d_std, steps) in enumerate(curriculum):
        print(f"[band {band}] sigma_delta={d_std} steps={steps}")
        pulses, _ = finetune_pulse_tables(
            pulses, q_rep, space, steps=steps, monte_carlo=monte_carlo,
            learning_rate=learning_rate, delta_std=d_std,
            epsilon_std=epsilon_std, seed=seed + band, backend=backend,
            log_every=max(steps // 4, 1))

    f = evaluate_tables(pulses, q_rep, monte_carlo=eval_mc, delta_std=1.0,
                        epsilon_std=epsilon_std, backend=backend)
    f = np.asarray(f).reshape(G, S)
    rows, best_pulses = [], {}
    for i, g in enumerate(names):
        j = int(f[i].argmax())
        rows.append((g, float(f[i, j]), float(f[i].mean()), j))
        best_pulses[g] = np.asarray(pulses.reshape(G, S, L, P)[i, j])
    return rows, best_pulses


def build_parser():
    p = argparse.ArgumentParser(
        description="P=4 single-target GRAPE ceiling (multi-start, random "
                    "init) at sigma_delta = 1")
    p.add_argument("--starts", type=int, default=16)
    p.add_argument("--num_pulses", type=int, default=100)
    p.add_argument("--monte_carlo", type=int, default=4096)
    p.add_argument("--eval_mc", type=int, default=200_000)
    p.add_argument("--learning_rate", type=float, default=3e-3)
    p.add_argument("--curriculum", default="0.4:800,0.7:800,1.0:1500",
                   help="comma-separated sigma:steps bands")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--backend", default="pallas", choices=["pallas", "xla"])
    p.add_argument("--gates", default=None,
                   help="comma-separated subset (default: all five)")
    p.add_argument("--out", default=None, help="markdown table output path")
    p.add_argument("--save_pulses", default=None,
                   help="optional .npz of the best table per gate")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    gates = args.gates.split(",") if args.gates else None
    curriculum = tuple((float(b.split(":")[0]), int(b.split(":")[1]))
                       for b in args.curriculum.split(","))
    rows, best = measure_ceiling(
        starts=args.starts, num_pulses=args.num_pulses,
        monte_carlo=args.monte_carlo, eval_mc=args.eval_mc,
        learning_rate=args.learning_rate, seed=args.seed,
        curriculum=curriculum, backend=args.backend, gates=gates)
    lines = ["| gate | P=4 GRAPE ceiling (best of "
             f"{args.starts}) | mean over starts |", "|---|---:|---:|"]
    for g, best_f, mean_f, _ in rows:
        lines.append(f"| {g} | {best_f:.4f} | {mean_f:.4f} |")
    text = "\n".join(lines)
    print(text)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(text + "\n")
    if args.save_pulses:
        np.savez(args.save_pulses,
                 **{f"pulses_{g}": v for g, v in best.items()})


if __name__ == "__main__":
    main()
