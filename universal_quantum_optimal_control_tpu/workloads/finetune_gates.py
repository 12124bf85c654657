r"""Per-gate pulse finetuning from the universal flagship — CLI entry point.

Closes the gap between the universal model (one network covering all of
SU(2): 0.947–0.950 per named gate at σ_δ = 1) and the single-target optimum
(GRAPE ceiling 0.9536 at the same L=100 pulse space): take the flagship's
pulse table for each named demo gate (the reference's five-gate set,
visualize/visualize_universal_with_pipeline.py:77-85), re-parameterize it as
sigmoid logits over the model's own pulse space, and polish each table with
direct gradient ascent on E[F] through the fused Pallas objective.

This is the reference's per-gate demo framing (demo_universal/app.py:52-59)
taken to its optimum: the universal model proposes, single-target GRAPE
polishing disposes.  Output is one ``.npz`` bundle of per-gate pulse tables
+ eval fidelities that the demo app serves for exact named-gate requests
(falling back to the universal model elsewhere).
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.errors import sample_ore_ple
from ..core.su2 import rotation_vector_to_quat
from ..data import named_gate_rotation_vectors
from ..parallel.mc_parallel import mean_fidelity_local

__all__ = ["main", "finetune_pulse_tables", "load_gate_bundle"]

from pathlib import Path as _Path

_WEIGHTS = _Path(__file__).parent.parent / "demo" / "weights"


def clamp_tau_nonnegative(pulse_space):
    """PHYSICALITY GUARD for the polish box.

    A zeroable-tau model box (low < 0 — reference length_400.json
    semantics) is only physical because the model HEAD relu's tau.  The
    polish optimizes the raw box, and a negative duration is
    time-REVERSED evolution: exp(+i H tau) undoes the disorder term
    exactly, a perfect unphysical echo (an unguarded polish "reaches"
    E[F] = 0.9999 at sigma_delta = 1).  Clamp the tau channel's low to 0;
    zeroed segments start at the bottom edge and can still revive."""
    return tuple(
        (name, (max(lo, 0.0), hi)) if name in ("tau", "t")
        else (name, (lo, hi))
        for name, (lo, hi) in pulse_space)


def _logits_from_pulses(pulses: jnp.ndarray, low: jnp.ndarray,
                        high: jnp.ndarray) -> jnp.ndarray:
    """Invert the sigmoid range map so optimization starts EXACTLY at the
    model's pulses (clipped a hair inside the open interval)."""
    u = (pulses - low) / (high - low)
    u = jnp.clip(u, 1e-4, 1.0 - 1e-4)
    return jnp.log(u / (1.0 - u))


def finetune_pulse_tables(pulses0, q_targets, pulse_space, *, steps=1500,
                          monte_carlo=8192, learning_rate=3e-3,
                          delta_std=1.0, epsilon_std=0.05, seed=0,
                          backend="pallas", log_every=100):
    """Polish ``(G, L, P)`` pulse tables by direct gradient ascent on E[F].

    The G tables are optimized jointly in one kernel launch (Adam is
    elementwise, so joint = independent per-gate optimization).  Fresh
    disorder is drawn each step (stochastic gradients — no fixed-set
    overfitting).  Returns (pulses, history list of (step, mean E[F])).
    """
    low = jnp.asarray([lo for _, (lo, _) in pulse_space], jnp.float32)
    high = jnp.asarray([hi for _, (_, hi) in pulse_space], jnp.float32)
    logits = _logits_from_pulses(pulses0, low, high)

    opt = optax.adam(learning_rate)
    opt_state = opt.init(logits)

    def to_pulses(lg):
        return low + (high - low) * jax.nn.sigmoid(lg)

    @jax.jit
    def step_fn(lg, opt_state, key):
        delta, eps = sample_ore_ple(key, (lg.shape[0], monte_carlo),
                                    delta_std, epsilon_std)

        def loss_fn(lg):
            f = mean_fidelity_local(to_pulses(lg), q_targets, delta, eps,
                                    backend)
            return -jnp.mean(f), f

        (loss, f), g = jax.value_and_grad(loss_fn, has_aux=True)(lg)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(lg, updates), opt_state, f

    history = []
    key = jax.random.PRNGKey(seed)
    best_logits, best_f = logits, -jnp.inf
    for i in range(steps):
        key, sub = jax.random.split(key)
        logits, opt_state, f = step_fn(logits, opt_state, sub)
        if (i + 1) % log_every == 0 or i == 0:
            mf = float(jnp.mean(f))
            history.append((i + 1, mf))
            if mf > best_f:
                best_f, best_logits = mf, logits
            print(f"  step {i + 1:5d}  mean E[F] {mf:.5f}")
    return to_pulses(best_logits), history


def evaluate_tables(pulses, q_targets, *, monte_carlo=200_000,
                    delta_std=1.0, epsilon_std=0.05, seed=123,
                    backend="pallas"):
    """Converged per-gate E[F] (CRN across gates; SE ≈ std/√M < 1e-4)."""
    delta, eps = sample_ore_ple(jax.random.PRNGKey(seed),
                                (pulses.shape[0], monte_carlo),
                                delta_std, epsilon_std)
    return np.asarray(mean_fidelity_local(pulses, q_targets, delta, eps,
                                          backend))


def load_gate_bundle(path: str):
    """Load a gate bundle ``.npz`` → (dict gate → pulses, metadata dict)."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta_json"]))
    tables = {g: z[f"pulses_{i}"] for i, g in enumerate(meta["gates"])}
    return tables, meta


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Finetune per-named-gate pulse tables from a universal "
                    "model checkpoint")
    p.add_argument("--variant", default="length_100",
                   help="demo model variant to initialize from")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--gates", default=None,
                   help="comma list; default = all five named gates")
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--monte_carlo", type=int, default=8192)
    p.add_argument("--learning_rate", type=float, default=3e-3)
    p.add_argument("--delta_std", type=float, default=1.0)
    p.add_argument("--epsilon_std", type=float, default=0.05)
    p.add_argument("--eval_mc", type=int, default=200_000)
    p.add_argument("--backend", default="pallas",
                   choices=["xla", "pallas"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pulse_params", type=int, default=None, choices=[2, 3, 4],
                   help="widen the polish space beyond the model's: 3 adds "
                        "the Rabi amplitude Omega, 4 adds the detuning "
                        "Delta (the reference's full declared space, "
                        "test.py:16-18).  Tables start exactly at the "
                        "model's pulses (Omega=1, Delta=0), so any gain is "
                        "attributable to the extra controls")
    p.add_argument("--delta_range", type=float, default=5.0,
                   help="detuning control range (-x, x) for --pulse_params 4 "
                        "(the reference declares (-5, 5))")
    p.add_argument("--out", default=str(_WEIGHTS / "length100_gates.npz"))
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from ..demo.app import load_pipeline

    pipe = load_pipeline(args.variant, args.checkpoint)
    gates = named_gate_rotation_vectors()
    if args.gates:
        wanted = [g.strip() for g in args.gates.split(",")]
        gates = {k: gates[k] for k in wanted}
    names = list(gates)
    rv = jnp.stack([gates[g] for g in names])          # (G, 4)
    q_targets = rotation_vector_to_quat(rv)
    pulses0 = jnp.asarray(pipe(rv))                    # (G, L, P)

    f0 = evaluate_tables(pulses0, q_targets, monte_carlo=args.eval_mc,
                         delta_std=args.delta_std,
                         epsilon_std=args.epsilon_std,
                         backend=args.backend)
    print("model E[F] at sigma={}: {}".format(
        args.delta_std,
        {g: round(float(v), 4) for g, v in zip(names, f0)}))

    pulse_space = clamp_tau_nonnegative(tuple(pipe.model.pulse_space))
    pulses0 = jnp.concatenate(
        [pulses0[..., :-1], jnp.maximum(pulses0[..., -1:], 0.0)], axis=-1)
    P0 = pulses0.shape[-1]
    if args.pulse_params and args.pulse_params > P0:
        if P0 != 2:
            raise ValueError("--pulse_params widening expects a 2-parameter "
                             f"source model, got P={P0}")
        # widen (φ, τ) → (φ, Ω[, Δ], τ) with the extra controls at their
        # P=2-equivalent values, so step 0 reproduces the source fidelity
        G, L, _ = pulses0.shape
        # Ω starts at 1.0 (the P=2 implicit amplitude); the logits clip puts
        # it at 0.9999 inside the open range — step 0 ≈ source fidelity
        cols = [pulses0[..., 0], jnp.full((G, L), 1.0)]
        extra = [("omega", (0.0, 1.0))]
        if args.pulse_params == 4:
            cols.append(jnp.zeros((G, L)))
            extra.append(("delta", (-args.delta_range, args.delta_range)))
        cols.append(pulses0[..., 1])
        pulses0 = jnp.stack(cols, axis=-1)
        pulse_space = (pulse_space[0], *extra, pulse_space[1])
        f0w = evaluate_tables(pulses0, q_targets, monte_carlo=args.eval_mc,
                              delta_std=args.delta_std,
                              epsilon_std=args.epsilon_std,
                              backend=args.backend)
        print("widened P={} start E[F]: {}".format(
            args.pulse_params,
            {g: round(float(v), 4) for g, v in zip(names, f0w)}))
    pulses, history = finetune_pulse_tables(
        pulses0, q_targets, pulse_space, steps=args.steps,
        monte_carlo=args.monte_carlo, learning_rate=args.learning_rate,
        delta_std=args.delta_std, epsilon_std=args.epsilon_std,
        seed=args.seed, backend=args.backend)

    f1 = evaluate_tables(pulses, q_targets, monte_carlo=args.eval_mc,
                         delta_std=args.delta_std,
                         epsilon_std=args.epsilon_std,
                         backend=args.backend)
    print("finetuned E[F]: {}".format(
        {g: round(float(v), 4) for g, v in zip(names, f1)}))

    meta = {
        "gates": names,
        "rotation_vectors": np.asarray(rv).tolist(),
        "delta_std": args.delta_std,
        "epsilon_std": args.epsilon_std,
        "eval_mc": args.eval_mc,
        "fidelity_model": [float(v) for v in f0],
        "fidelity_finetuned": [float(v) for v in f1],
        "source_variant": args.variant,
        "steps": args.steps,
    }
    arrays = {f"pulses_{i}": np.asarray(pulses[i]) for i in range(len(names))}
    from pathlib import Path
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, meta_json=json.dumps(meta), **arrays)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
