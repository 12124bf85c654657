r"""Two-qubit gate GRAPE — CLI (the CZ workload, BASELINE configs[4]).

Multi-start block-structured GRAPE for entangling gates on the cross-talk +
always-on-ZZ system (see :mod:`..optimizers.two_qubit_grape` for why the
block parameterization makes CZ convergent from every start).  Optionally
trains disorder robustness over a σ curriculum and emits an E[F](σ_δ)
robustness curve for the final pulse.

Usage:
    python -m universal_quantum_optimal_control_tpu.workloads.two_qubit_grape \
        --gate cz --sigmas 0.1,0.2 --out weights/cz
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..core import su4
from ..optimizers.two_qubit_grape import (
    TwoQubitGrapeConfig,
    multistart_grape_su4,
    named_two_qubit_targets,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Two-qubit gate GRAPE")
    p.add_argument("--gate", default="cz",
                   help=f"named target {sorted(named_two_qubit_targets())} "
                        "or use --target_npz")
    p.add_argument("--target_npz", default=None,
                   help=".npz with a complex (4,4) 'u_target' array")
    p.add_argument("--mode", default="blocks", choices=["blocks", "table"])
    p.add_argument("--n_blocks", type=int, default=10)
    p.add_argument("--num_pulses", type=int, default=100)
    p.add_argument("--n_starts", type=int, default=24)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--learning_rate", type=float, default=0.02)
    p.add_argument("--sigmas", default="",
                   help="comma-separated disorder curriculum, e.g. '0.1,0.2'")
    p.add_argument("--monte_carlo", type=int, default=128)
    p.add_argument("--xtalk", type=float, default=0.1)
    p.add_argument("--coupling", type=float, default=0.5)
    p.add_argument("--drive2", action="store_true",
                   help="system variant: direct drive line on qubit 2 "
                        "(4-parameter pulses, symmetric cross-talk) — the "
                        "delta2-refocusability falsification experiment "
                        "(docs/two_qubit_results.md)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="weights/two_qubit_grape")
    p.add_argument("--curve_sigmas", default="0.02,0.05,0.1,0.15,0.2,0.3",
                   help="σ_δ grid for the final robustness curve")
    p.add_argument("--curve_mc", type=int, default=4096)
    return p


def robustness_curve(pulses, u_target, sigmas, monte_carlo, system,
                     epsilon_std=0.05, seed=1, backend="pallas"):
    """E[F](σ_δ) ± SE for one pulse table (both qubits' δ at σ, shared ε).

    ``backend="pallas"`` propagates with the fused SoA kernel
    (:mod:`..ops.propagate_su4_pallas` — MC samples on VPU lanes);
    ``"xla"`` keeps the batched-matmul oracle path."""
    TR = jnp.asarray(np.asarray(u_target).real, jnp.float32)
    TI = jnp.asarray(np.asarray(u_target).imag, jnp.float32)
    p = jnp.asarray(pulses)[None]
    rows = []
    key = jax.random.PRNGKey(seed)
    for s in sigmas:
        key, k1, k2, k3 = jax.random.split(key, 4)
        M = monte_carlo
        d1 = jax.random.normal(k1, (1, M)) * s
        d2 = jax.random.normal(k2, (1, M)) * s
        ep = jax.random.normal(k3, (1, M)) * epsilon_std
        if backend == "pallas":
            from ..ops import propagate_su4_mc_pallas
            Ur, Ui = propagate_su4_mc_pallas(
                p, d1, d2, ep, xtalk=system.xtalk, coupling=system.coupling,
                drive2=system.drive2)
        else:
            Ur, Ui = su4.propagate_su4_mc(p, d1, d2, ep, system)
        F = np.asarray(su4.fidelity_su4_ri(Ur, Ui, TR, TI))[0]
        rows.append((float(s), float(F.mean()),
                     float(F.std() / np.sqrt(M))))
    return rows


def main(argv=None) -> None:
    from ..utils.device_warmup import warm_device

    warm_device("two_qubit_grape")
    args = build_parser().parse_args(argv)

    if args.target_npz:
        u_target = np.load(args.target_npz)["u_target"]
    else:
        targets = named_two_qubit_targets()
        if args.gate not in targets:
            raise ValueError(f"unknown gate {args.gate!r}; "
                             f"available: {sorted(targets)} or --target_npz")
        u_target = targets[args.gate]

    sigmas = tuple(float(s) for s in args.sigmas.split(",") if s)
    cfg = TwoQubitGrapeConfig(
        mode=args.mode, n_blocks=args.n_blocks, num_pulses=args.num_pulses,
        n_starts=args.n_starts, steps=args.steps,
        learning_rate=args.learning_rate, sigmas=sigmas,
        monte_carlo=args.monte_carlo, xtalk=args.xtalk,
        coupling=args.coupling, seed=args.seed, drive2=args.drive2)

    pulses, info = multistart_grape_su4(u_target, cfg, verbose=True)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    np.savez(out / "pulses.npz", pulses=pulses,
             u_target=np.asarray(u_target))

    system = su4.TwoQubitSystem(xtalk=args.xtalk, coupling=args.coupling,
                                drive2=args.drive2)
    curve_sigmas = [float(s) for s in args.curve_sigmas.split(",") if s]
    curve = robustness_curve(pulses, u_target, curve_sigmas, args.curve_mc,
                             system, backend="pallas")
    with open(out / "robustness.csv", "w") as f:
        f.write("sigma_delta,EF,SE\n")
        for s, m, se in curve:
            f.write(f"{s},{m},{se}\n")
    with open(out / "result.json", "w") as f:
        json.dump({"config": vars(args), "info": info, "curve": curve}, f,
                  indent=1)

    for st in info["stages"]:
        print(f"stage σ={st['sigma']}: best F = {st['best_fid']:.5f} "
              f"(mean over starts {st['mean_fid']:.4f})")
    print(f"exact fidelity of shipped pulse: {info['exact_fid_of_best']:.5f}")
    for s, m, se in curve:
        print(f"  E[F](σ_δ={s:g}) = {m:.4f} ± {se:.4f}")
    print(f"artifacts in {out}/")


if __name__ == "__main__":
    main()
