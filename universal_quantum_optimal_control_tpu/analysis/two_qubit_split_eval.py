r"""Products-half / KAK-half eval split for a two-qubit checkpoint — CLI.

The universal two-qubit trainer (``workloads/two_qubit.py``) reports one
blended ``eval_fid`` over its held-out mixed target set.  That number hides
the quantity that actually diagnosed the round-3 generalization wall
(``docs/two_qubit_results.md`` §The generalization wall): the *KAK-half*
fidelity — random Weyl-chamber-box constructions are the hard,
edge-class-covering half, while random reachable products are the easy half
the featurization already matches.  This CLI recomputes the trainer's exact
held-out eval set (same ``build_targets`` call on the ``seed``-derived eval
key — first half products, second half KAK; ``workloads/two_qubit.py:52-75``)
and reports the two halves separately.

No reference analog: the reference trains single-qubit models only; this is
the SU(4) counterpart of its per-gate eval framing
(visualize/visualize_universal_with_pipeline.py:77-87).

Usage::

    python -m universal_quantum_optimal_control_tpu.analysis.two_qubit_split_eval \
        CHECKPOINT --sigma 0.2 [--monte_carlo 2048] [--eval_size 512]

``CHECKPOINT`` is a shipped ``.npz`` or an Orbax ``dir:tag``; model
hyper-flags mirror ``workloads/two_qubit_eval``.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..training.systems import SU4System
from ..workloads.two_qubit import build_targets
from ..workloads.two_qubit_eval import model_gate_pulses

__all__ = ["main", "split_eval"]


def split_eval(checkpoint: str, *, sigma: float, monte_carlo: int = 2048,
               eval_size: int = 512, seed: int = 0, epsilon_std: float = 0.05,
               chunk: int = 64, eval_seed: int = 42,
               system: SU4System | None = None, **model_kw) -> dict:
    """Mean E[F] over the trainer's held-out eval set, split by half.

    Returns ``{"products": float, "kak": float, "blended": float}``.
    ``model_kw`` forwards to :func:`..workloads.two_qubit_eval.model_gate_pulses`
    (``drive2``, ``kak_tokens``, ``omega_min``, model shape, …).
    """
    system = system or SU4System(drive2=model_kw.get("drive2", False))
    _, k2 = jax.random.split(jax.random.PRNGKey(seed))
    eval_t = build_targets(k2, eval_size, system.system, mode="mixed",
                           phase_augment=True)

    @jax.jit
    def fid(pulses, ts, key):
        ks = jax.random.split(key, 3)
        B = pulses.shape[0]
        d1 = sigma * jax.random.normal(ks[0], (B, monte_carlo))
        d2 = sigma * jax.random.normal(ks[1], (B, monte_carlo))
        ep = epsilon_std * jax.random.normal(ks[2], (B, monte_carlo))
        return system.local_mean_fidelity(pulses, ts, (d1, d2, ep))

    key = jax.random.PRNGKey(eval_seed)
    all_pulses = model_gate_pulses(checkpoint, eval_t, **model_kw)
    chunks = []
    for i in range(0, eval_size, chunk):  # chunk the MC propagation only
        chunks.append(np.asarray(
            fid(all_pulses[i:i + chunk], eval_t[i:i + chunk], key)))
    F = np.concatenate(chunks)
    half = eval_size // 2
    return {"products": float(F[:half].mean()),
            "kak": float(F[half:].mean()),
            "blended": float(F.mean()),
            "per_target": F,
            "targets": np.asarray(eval_t),
            "pulses": np.asarray(all_pulses)}


def main(argv=None) -> None:
    from ..utils.device_warmup import warm_device

    warm_device("split_eval")
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("checkpoint", help="'dir:tag' Orbax checkpoint or .npz")
    p.add_argument("--sigma", type=float, default=0.0)
    p.add_argument("--monte_carlo", type=int, default=2048)
    p.add_argument("--eval_size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0,
                   help="trainer seed whose eval split to reproduce")
    p.add_argument("--epsilon_std", type=float, default=0.05)
    p.add_argument("--max_pulses", type=int, default=100,
                   help="checkpoint pulse-sequence length (default matches "
                        "the shipped L=100 flagship; pass 40 for L=40 runs)")
    p.add_argument("--d_model", type=int, default=512)
    p.add_argument("--n_layers", type=int, default=8)
    p.add_argument("--n_heads", type=int, default=16)
    p.add_argument("--drive2", action="store_true")
    p.add_argument("--kak_features", action="store_true")
    p.add_argument("--kak_tokens", action="store_true")
    p.add_argument("--omega_min", type=float, default=0.0)
    p.add_argument("--per_target_csv", default=None,
                   help="write index,class,fid per eval target")
    p.add_argument("--dump_kak_percentiles", default=None,
                   help="comma list of percentiles of the KAK-half fidelity "
                        "distribution (e.g. '10,50,90'); the target nearest "
                        "each is dumped as <dump_dir>/kak_p<P>_i<IDX>.npz "
                        "with a (4,4) 'u_target' — the input format "
                        "workloads/two_qubit_grape.py --target_npz takes "
                        "for single-target ceiling calibration")
    p.add_argument("--dump_dir", default="runs/kak_targets")
    p.add_argument("--channels_worst_decile", action="store_true",
                   help="per-channel (δ₁/δ₂/ε) loss decomposition of the "
                        "worst-decile KAK-half targets at --sigma, via "
                        "analysis/dephasing_bound.measure_channels — says "
                        "WHICH disorder channel the tail loses to")
    p.add_argument("--channels_mc", type=int, default=20_000)
    args = p.parse_args(argv)

    out = split_eval(
        args.checkpoint, sigma=args.sigma, monte_carlo=args.monte_carlo,
        eval_size=args.eval_size, seed=args.seed,
        epsilon_std=args.epsilon_std, max_pulses=args.max_pulses,
        d_model=args.d_model, n_layers=args.n_layers, n_heads=args.n_heads,
        drive2=args.drive2, kak_features=args.kak_features,
        kak_tokens=args.kak_tokens, omega_min=args.omega_min)
    print(f"sigma={args.sigma} M={args.monte_carlo} "
          f"products_half={out['products']:.4f} kak_half={out['kak']:.4f} "
          f"blended={out['blended']:.4f}")

    # time-budget readout (round 5): what total duration T = sum(tau) does
    # the model actually use, and does the tau box bind?  The round-4
    # calibrations showed sigma=0.4 GRAPE winners at T~62-139 vs the L=40
    # model's 15.4 — this prints the distribution for any checkpoint.
    tau = out["pulses"][..., -1]
    T = tau.sum(axis=-1)
    sat = float((tau > 0.5 - 0.005).mean())
    print(f"duration T=sum(tau): mean={T.mean():.1f} p10={np.percentile(T, 10):.1f} "
          f"p50={np.percentile(T, 50):.1f} p90={np.percentile(T, 90):.1f} "
          f"max={T.max():.1f} tau_at_box_top={sat:.1%}")

    import os

    half = args.eval_size // 2
    if args.per_target_csv:
        if os.path.dirname(args.per_target_csv):
            os.makedirs(os.path.dirname(args.per_target_csv), exist_ok=True)
        with open(args.per_target_csv, "w") as f:
            f.write("index,class,fid\n")
            for i, v in enumerate(out["per_target"]):
                f.write(f"{i},{'products' if i < half else 'kak'},{v:.6f}\n")
        print(f"per-target CSV -> {args.per_target_csv}")
    if args.dump_kak_percentiles:
        os.makedirs(args.dump_dir, exist_ok=True)
        kak_f = out["per_target"][half:]
        order = np.argsort(kak_f)
        for ptxt in args.dump_kak_percentiles.split(","):
            pct = float(ptxt)
            j = order[min(len(order) - 1,
                          int(round(pct / 100 * (len(order) - 1))))]
            idx = half + int(j)
            path = os.path.join(args.dump_dir, f"kak_p{ptxt}_i{idx}.npz")
            # targets are SoA (re, im) stacked — two_qubit_grape takes complex
            u_c = out["targets"][idx, 0] + 1j * out["targets"][idx, 1]
            np.savez(path, u_target=u_c,
                     model_fid=out["per_target"][idx], sigma=args.sigma)
            print(f"p{ptxt}: eval index {idx} model_fid="
                  f"{out['per_target'][idx]:.4f} -> {path}")

    if args.channels_worst_decile:
        from .dephasing_bound import measure_channels

        system = SU4System(drive2=args.drive2)
        kak_f = out["per_target"][half:]
        order = np.argsort(kak_f)
        n10 = max(len(order) // 10, 1)
        groups = {
            "products half": np.arange(half),
            "KAK better 90%": half + order[n10:],
            "KAK worst decile": half + order[:n10],
        }
        print(f"\nper-channel decomposition at sigma={args.sigma} "
              f"(M={args.channels_mc}, eps_std={args.epsilon_std}):")
        print("| subset | exact (no disorder) | E[F] δ₁ only | δ₂ only "
              "| ε only | full | f₁·f₂·f_ε |")
        print("|---|---:|---:|---:|---:|---:|---:|")
        for name, idx in groups.items():
            pl = jnp.asarray(out["pulses"][idx])
            ts = jnp.asarray(out["targets"][idx])
            z = jnp.zeros((len(idx), 1))
            f_exact = float(np.mean(np.asarray(
                system.local_mean_fidelity(pl, ts, (z, z, z)))))
            rows, T_mean, _ = measure_channels(
                pl, ts, [args.sigma], system=system,
                monte_carlo=args.channels_mc,
                epsilon_std=args.epsilon_std)
            _, f1, f2, fe, ff, fp = rows[0]
            print(f"| {name} (n={len(idx)}, T̄={T_mean:.1f}) | {f_exact:.4f} "
                  f"| {f1:.4f} | {f2:.4f} | {fe:.4f} | {ff:.4f} "
                  f"| {fp:.4f} |")


if __name__ == "__main__":
    main()
