r"""Per-gate two-qubit pulse finetuning — the SU(4) analog of
:mod:`.finetune_gates`.

The shipped two-qubit flagship (`two_qubit_d2_kak.npz`) serves the named
edge-class gates at 0.90–0.98 exact fidelity while single-target CZ GRAPE
reaches F = 1.0000 — the universal model proposes, single-target polishing
disposes (the same division of labor as the single-qubit
``length100_gates_p4.npz`` bundle, and the reference's per-gate demo framing,
demo_universal/app.py:52-59).  Two candidate sources per named gate:

1. **Model-basin polish**: take the flagship's best-of-ℤ₄ pulse table and
   run direct gradient ascent on a σ-mixed Monte-Carlo expected fidelity
   through the fused SU(4) Pallas VJP kernel, inside the model's own pulse
   box (the single-qubit lesson: the universal model's basin beats
   GRAPE-from-scratch-started polish).
2. **Blocks GRAPE** (``--grape``): multi-start block-structured GRAPE with a
   σ curriculum (:mod:`..optimizers.two_qubit_grape`) — the recipe behind
   the shipped ``cz_drive2_pulse.npz``.

Each gate ships whichever candidate scores best on the σ-grid eval
(CRN across σ, ``two_qubit_eval.eval_pulse_tables``).  Output is one
``.npz`` bundle the demo app serves for exact named-gate requests
(``two_qubit_gates`` variant), falling back to the universal model
elsewhere.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..optimizers.two_qubit_grape import (
    TwoQubitGrapeConfig,
    multistart_grape_su4,
    named_two_qubit_targets,
)
from ..training.systems import SU4System

__all__ = ["main", "finetune_su4_tables", "load_two_qubit_gate_bundle"]

_WEIGHTS = Path(__file__).parent.parent / "demo" / "weights"
DEFAULT_CKPT = str(_WEIGHTS / "two_qubit_d2_kak.npz")

# the flagship's drive2 pulse box (training-time range map — the sigmoid
# edges are baked into the head's calibration, workloads/two_qubit.py)
DRIVE2_SPACE = (("phi1", (-3.15, 3.15)), ("phi2", (-3.15, 3.15)),
                ("omega", (0.05, 1.0)), ("tau", (0.1, 0.5)))


def _logits_from_pulses(pulses, low, high):
    """Invert the sigmoid range map so optimization starts EXACTLY at the
    model's pulses (clipped a hair inside the open interval)."""
    u = (pulses - low) / (high - low)
    u = jnp.clip(u, 1e-4, 1.0 - 1e-4)
    return jnp.log(u / (1.0 - u))


def finetune_su4_tables(pulses0, targets_packed, pulse_space, *,
                        steps=1500, monte_carlo=4096, learning_rate=3e-3,
                        sigma_mix=(0.0, 0.1, 0.2), epsilon_std=0.05,
                        seed=0, system=None, backend="pallas",
                        log_every=100):
    """Polish ``(G, L, P)`` SU(4) pulse tables by gradient ascent on the
    σ-mixed expected fidelity (equal-weight mean over ``sigma_mix``; the
    σ = 0 term is the exact fidelity).

    Fresh disorder each step, shared normalized draws scaled per σ (CRN
    across the mix).  Adam is elementwise, so the G tables optimize jointly
    in one kernel launch = independently per gate.  Returns
    ``(pulses, history)`` with the best-objective iterate kept.
    """
    system = system or SU4System(drive2=True, backend=backend)
    low = jnp.asarray([lo for _, (lo, _) in pulse_space], jnp.float32)
    high = jnp.asarray([hi for _, (_, hi) in pulse_space], jnp.float32)
    logits = _logits_from_pulses(jnp.asarray(pulses0), low, high)
    G = logits.shape[0]
    sig_pos = [float(s) for s in sigma_mix if s > 0.0]
    with_exact = any(s == 0.0 for s in sigma_mix)
    n_terms = len(sig_pos) + (1 if with_exact else 0)

    opt = optax.adam(learning_rate)
    opt_state = opt.init(logits)

    def to_pulses(lg):
        return low + (high - low) * jax.nn.sigmoid(lg)

    zeros1 = jnp.zeros((G, 1), jnp.float32)

    @jax.jit
    def step_fn(lg, opt_state, key):
        k1, k2, k3 = jax.random.split(key, 3)
        d1 = jax.random.normal(k1, (G, monte_carlo))
        d2 = jax.random.normal(k2, (G, monte_carlo))
        ep = jax.random.normal(k3, (G, monte_carlo)) * epsilon_std

        def loss_fn(lg):
            pulses = to_pulses(lg)
            per_gate = jnp.zeros((G,), jnp.float32)
            if with_exact:
                per_gate += system.local_mean_fidelity(
                    pulses, targets_packed, (zeros1, zeros1, zeros1))
            for s in sig_pos:
                per_gate += system.local_mean_fidelity(
                    pulses, targets_packed, (d1 * s, d2 * s, ep))
            per_gate = per_gate / n_terms
            return -jnp.mean(per_gate), per_gate

        (loss, f), g = jax.value_and_grad(loss_fn, has_aux=True)(lg)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(lg, updates), opt_state, f

    history = []
    key = jax.random.PRNGKey(seed)
    best_logits, best_f = logits, -np.inf
    for i in range(steps):
        key, sub = jax.random.split(key)
        logits, opt_state, f = step_fn(logits, opt_state, sub)
        if (i + 1) % log_every == 0 or i == 0:
            mf = float(jnp.mean(f))
            history.append((i + 1, mf))
            if mf > best_f:
                best_f, best_logits = mf, logits
            print(f"  step {i + 1:5d}  sigma-mixed mean E[F] {mf:.5f}",
                  flush=True)
    return to_pulses(best_logits), history


def load_two_qubit_gate_bundle(path: str):
    """Load a two-qubit gate bundle ``.npz`` → (dict gate → pulses, meta).

    Tables may be ragged across gates (model tables are L=40, blocks-GRAPE
    tables L=2·n_blocks), so they ship as separate per-gate arrays.
    """
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta_json"]))
    tables = {g: z[f"pulses_{i}"] for i, g in enumerate(meta["gates"])}
    return tables, meta


def _score(table_row, sigmas, select_sigmas):
    idx = [sigmas.index(s) for s in select_sigmas]
    return float(np.mean([table_row[i] for i in idx]))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Finetune per-named-gate SU(4) pulse tables from the "
                    "two-qubit flagship (+ optional blocks GRAPE)")
    p.add_argument("--checkpoint", default=DEFAULT_CKPT)
    p.add_argument("--gates", default=None,
                   help="comma list; default = all five named gates")
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--monte_carlo", type=int, default=4096)
    p.add_argument("--learning_rate", type=float, default=3e-3)
    p.add_argument("--sigma_mix", default="0,0.1,0.2",
                   help="polish objective: equal-weight mean E[F] over "
                        "these sigma_delta values (0 = exact term)")
    p.add_argument("--epsilon_std", type=float, default=0.05)
    p.add_argument("--eval_sigmas", default="0,0.1,0.2,0.3")
    p.add_argument("--eval_mc", type=int, default=20_000)
    p.add_argument("--select_sigmas", default="0,0.1,0.2",
                   help="per-gate winner = best mean eval E[F] over these")
    p.add_argument("--backend", default="pallas", choices=["xla", "pallas"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--grape", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="also run per-gate multi-start blocks GRAPE "
                        "(sigma curriculum) as a second candidate")
    p.add_argument("--grape_sigmas", default="0.1,0.2")
    p.add_argument("--grape_starts", type=int, default=16)
    p.add_argument("--grape_steps", type=int, default=2000)
    # flagship model featurization (two_qubit_d2_kak.npz training config)
    p.add_argument("--max_pulses", type=int, default=100,
                   help="checkpoint pulse-sequence length (the shipped "
                        "flagship is L=100 since round 5)")
    p.add_argument("--omega_min", type=float, default=0.05)
    p.add_argument("--kak_tokens", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--out", default=str(_WEIGHTS / "two_qubit_gates.npz"))
    p.add_argument("--table_out", default=None,
                   help="write the markdown eval table here as well")
    return p


def main(argv=None) -> None:
    from .two_qubit_eval import best_phase_pulses, eval_pulse_tables

    args = build_parser().parse_args(argv)
    sigmas = [float(s) for s in args.eval_sigmas.split(",")]
    select = [float(s) for s in args.select_sigmas.split(",")]
    sigma_mix = tuple(float(s) for s in args.sigma_mix.split(","))
    system = SU4System(drive2=True, backend=args.backend)
    eval_system = SU4System(drive2=True)  # XLA oracle path for eval

    gates = named_two_qubit_targets()
    names = [g.strip() for g in args.gates.split(",")] if args.gates \
        else list(gates)
    U = np.stack([gates[g] for g in names])
    packed = SU4System.pack_target(U)

    pulses0 = best_phase_pulses(
        args.checkpoint, U, eval_system, drive2=True,
        kak_tokens=args.kak_tokens, omega_min=args.omega_min,
        max_pulses=args.max_pulses)
    f_model = eval_pulse_tables(pulses0, packed, sigmas,
                                monte_carlo=args.eval_mc,
                                epsilon_std=args.epsilon_std,
                                system=eval_system)
    print("model tables:",
          {g: [round(float(v), 4) for v in f_model[i]]
           for i, g in enumerate(names)}, flush=True)

    space = DRIVE2_SPACE[:2] + ((("omega", (args.omega_min, 1.0)),)
                                + DRIVE2_SPACE[3:])
    polished, _ = finetune_su4_tables(
        pulses0, packed, space, steps=args.steps,
        monte_carlo=args.monte_carlo, learning_rate=args.learning_rate,
        sigma_mix=sigma_mix, epsilon_std=args.epsilon_std, seed=args.seed,
        system=system)
    f_polish = eval_pulse_tables(polished, packed, sigmas,
                                 monte_carlo=args.eval_mc,
                                 epsilon_std=args.epsilon_std,
                                 system=eval_system)
    print("polished tables:",
          {g: [round(float(v), 4) for v in f_polish[i]]
           for i, g in enumerate(names)}, flush=True)

    candidates = {
        g: [("model", np.asarray(pulses0[i]), f_model[i]),
            ("polish", np.asarray(polished[i]), f_polish[i])]
        for i, g in enumerate(names)}

    if args.grape:
        g_sigmas = tuple(float(s) for s in args.grape_sigmas.split(",")
                         if s.strip())
        for i, g in enumerate(names):
            cfg = TwoQubitGrapeConfig(
                mode="blocks", n_starts=args.grape_starts,
                steps=args.grape_steps, drive2=True, sigmas=g_sigmas,
                seed=args.seed)
            gp, info = multistart_grape_su4(U[i], cfg)
            fg = eval_pulse_tables(jnp.asarray(gp)[None], packed[i:i + 1],
                                   sigmas, monte_carlo=args.eval_mc,
                                   epsilon_std=args.epsilon_std,
                                   system=eval_system)[0]
            candidates[g].append(("grape", np.asarray(gp), fg))
            print(f"grape {g}: {[round(float(v), 4) for v in fg]} "
                  f"(stages {[round(s['best_fid'], 4) for s in info['stages']]})",
                  flush=True)

    chosen, fid_rows, sources = [], [], []
    for g in names:
        best = max(candidates[g], key=lambda c: _score(c[2], sigmas, select))
        sources.append(best[0])
        chosen.append(best[1])
        fid_rows.append([float(v) for v in best[2]])

    header = "| gate | source | " + " | ".join(
        f"E[F] σ={s:g}" for s in sigmas) + " |"
    lines = ["# Two-qubit per-gate finetuned bundle", "",
             f"Flagship `{Path(args.checkpoint).name}` basin polish vs "
             f"blocks GRAPE, best-of per gate; M={args.eval_mc}, "
             f"ε_std={args.epsilon_std}, CRN across σ.", "",
             header, "|" + "---|" * (len(sigmas) + 2)]
    for i, g in enumerate(names):
        lines.append(f"| {g} | {sources[i]} | " + " | ".join(
            f"{v:.4f}" for v in fid_rows[i]) + " |")
    text = "\n".join(lines)
    print(text, flush=True)

    meta = {"gates": names, "sigmas": sigmas, "sources": sources,
            "fidelity": fid_rows,
            "fidelity_model": [[float(v) for v in row] for row in f_model],
            "epsilon_std": args.epsilon_std, "eval_mc": args.eval_mc,
            "drive2": True, "checkpoint": Path(args.checkpoint).name,
            "sigma_mix": list(sigma_mix), "steps": args.steps}
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, meta_json=json.dumps(meta),
             **{f"pulses_{i}": np.asarray(p, np.float32)
                for i, p in enumerate(chosen)})
    print(f"saved {out}")
    if args.table_out:
        Path(args.table_out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.table_out).write_text(text + "\n")


if __name__ == "__main__":
    main()
