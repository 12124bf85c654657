r"""Two-qubit named-gate evaluation — CLI entry point.

Produces the SU(4) analog of the single-qubit five-gate table
(docs/model_vs_score_length100.md; reference framing
visualize/visualize_universal_with_pipeline.py:77-87): per-named-gate
``E[F]`` of the shipped universal two-qubit model at σ_δ ∈ {0, 0.1, 0.2},
for CZ / CNOT / iSWAP / √SWAP / ZZ(π/4).  Optionally polishes each gate with
multi-start GRAPE from scratch (``--polish``) so model-vs-single-target
quality is visible side by side.

Output: a markdown table (stdout + ``--out`` file) and a ``.npz`` of the
model's per-gate pulse tables.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..core import su4
from ..models import normalize_pulse_space
from ..models.serialization import load_params_npz
from ..models.two_qubit import TwoQubitQOCTransformer
from ..optimizers.two_qubit_grape import (
    TwoQubitGrapeConfig,
    multistart_grape_su4,
    named_two_qubit_targets,
)
from ..training.systems import SU4System

__all__ = ["main", "eval_pulse_tables", "model_gate_pulses"]

_WEIGHTS = Path(__file__).parent.parent / "demo" / "weights"
DEFAULT_CKPT = str(_WEIGHTS / "two_qubit_d2_kak.npz")


def model_gate_pulses(checkpoint: str, targets_packed: jax.Array,
                      *, max_pulses: int = 40, d_model: int = 512,
                      n_layers: int = 8, n_heads: int = 16,
                      drive2: bool = False, kak_features: bool = False,
                      kak_tokens: bool = False,
                      omega_min: float = 0.0) -> jax.Array:
    """Run the universal two-qubit model on packed ``(G, 2, 4, 4)`` targets.

    ``checkpoint`` is a shipped ``.npz`` artifact or an Orbax ``dir:tag``.
    ``kak_tokens`` checkpoints take the host KAK featurization
    (``data.su4_targets.kak_input_tokens``) — computed here from the packed
    targets.  ``omega_min`` must match the training-time range map (the
    sigmoid low edge is baked into the head's calibration)."""
    space = {"phi": (-3.15, 3.15), "tau": (0.1, 0.5)}
    if drive2:
        space = {"phi1": (-3.15, 3.15), "phi2": (-3.15, 3.15),
                 "omega": (omega_min, 1.0), "tau": (0.1, 0.5)}
    model = TwoQubitQOCTransformer(
        pulse_space=normalize_pulse_space(space),
        max_pulses=max_pulses, d_model=d_model, n_layers=n_layers,
        n_heads=n_heads, dtype=jnp.float32, kak_features=kak_features,
        kak_tokens=kak_tokens)
    inputs = targets_packed
    if kak_tokens:
        from ..data.su4_targets import kak_input_tokens
        U = (np.asarray(targets_packed[:, 0], np.float64)
             + 1j * np.asarray(targets_packed[:, 1], np.float64))
        inputs = jnp.asarray(kak_input_tokens(U))
    template = model.init(jax.random.PRNGKey(0), inputs)
    if not checkpoint.endswith(".npz") and ":" in checkpoint:
        from ..training.checkpoint import restore_checkpoint
        base_dir, tag = checkpoint.rsplit(":", 1)
        params, _ = restore_checkpoint(base_dir, tag, target=template)
    else:
        params = load_params_npz(checkpoint, template)
    return model.apply(params, inputs)


def best_phase_pulses(checkpoint: str, U: np.ndarray,
                      system: SU4System, **model_kw) -> jax.Array:
    """Inference-time global-phase canonicalization: run the model on all 4
    SU(4) ℤ₄ representatives of each gate, keep the pulse table whose exact
    σ = 0 fidelity is best.  Fidelity is phase-invariant; the raw-matrix
    featurization is not — measured on the round-2 products-only model this
    lifts zz(π/4) from 0.267 to 0.9992 (docs/two_qubit_results.md).

    ``(G, 4, 4)`` complex → ``(G, L, P)`` pulses."""
    from ..data.su4_targets import z4_representatives

    reps = np.stack([z4_representatives(u) for u in U])   # (G, 4, 4, 4)
    G = reps.shape[0]
    packed = SU4System.pack_target(reps.reshape(G * 4, 4, 4))
    pulses = model_gate_pulses(checkpoint, packed, **model_kw)
    z = jnp.zeros(G * 4)
    Ur, Ui = su4.propagate_su4(pulses, z, z, z, system.system)
    F = su4.fidelity_su4_ri(Ur, Ui, packed[:, 0], packed[:, 1])
    best = jnp.argmax(F.reshape(G, 4), axis=1)            # (G,)
    return jnp.take_along_axis(
        pulses.reshape(G, 4, *pulses.shape[1:]),
        best[:, None, None, None], axis=1)[:, 0]


def eval_pulse_tables(pulses: jax.Array, targets_packed: jax.Array,
                      sigmas, *, monte_carlo: int = 20_000,
                      epsilon_std: float = 0.05, seed: int = 7,
                      system: SU4System | None = None) -> np.ndarray:
    """Per-gate E[F] at each σ_δ: returns ``(G, len(sigmas))``.

    Common random numbers across σ (same normalized draws scaled per σ) so
    columns are comparable; σ = 0 is evaluated exactly (no MC noise).
    """
    system = system or SU4System()
    G = pulses.shape[0]
    key = jax.random.PRNGKey(seed)
    base = system.sample_errors(key, (G, monte_carlo), 1.0, 1.0)

    @jax.jit
    def one_sigma(sigma):
        d1 = base[0] * sigma
        d2 = base[1] * sigma
        ep = base[2] * epsilon_std
        return system.local_mean_fidelity(pulses, targets_packed,
                                          (d1, d2, ep))

    cols = []
    for s in sigmas:
        if s == 0.0:
            z = jnp.zeros((G, 1))
            ep = base[2][:, :1] * 0.0
            Ur, Ui = su4.propagate_su4_mc(pulses, z, z, ep, system.system)
            F = su4.fidelity_su4_ri(Ur, Ui, targets_packed[:, None, 0],
                                    targets_packed[:, None, 1])
            cols.append(np.asarray(F[:, 0]))
        else:
            cols.append(np.asarray(one_sigma(s)))
    return np.stack(cols, axis=1)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Evaluate the universal two-qubit model on named gates")
    p.add_argument("--checkpoint", default=DEFAULT_CKPT)
    p.add_argument("--sigmas", default="0,0.1,0.2")
    p.add_argument("--monte_carlo", type=int, default=20_000)
    p.add_argument("--epsilon_std", type=float, default=0.05)
    p.add_argument("--polish", action="store_true",
                   help="also run per-gate multi-start GRAPE (3-param "
                        "blocks mode) for the single-target comparison row")
    p.add_argument("--polish_starts", type=int, default=16)
    p.add_argument("--polish_steps", type=int, default=2000)
    p.add_argument("--out", default=None,
                   help="write the markdown table here as well")
    p.add_argument("--save_pulses", default=None,
                   help="write per-gate model pulse tables to this .npz")
    p.add_argument("--max_pulses", type=int, default=100,
                   help="checkpoint's pulse-sequence length (default matches "
                        "the shipped L=100 flagship; pass 40 for the L=40 "
                        "artifacts, e.g. two_qubit_d2_kak_s0.npz)")
    p.add_argument("--d_model", type=int, default=512)
    p.add_argument("--n_layers", type=int, default=8)
    p.add_argument("--n_heads", type=int, default=16)
    p.add_argument("--drive2", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="the checkpoint was trained on the drive2 system "
                        "(4-parameter pulses); evaluate on it too.  Default "
                        "matches the shipped KAK-trio default checkpoint; "
                        "--no-drive2 for chi-only-system checkpoints")
    p.add_argument("--kak_features", action="store_true",
                   help="the checkpoint uses the Makhlin/KAK input token")
    p.add_argument("--omega_min", type=float, default=0.05,
                   help="Omega range low edge baked into the checkpoint's "
                        "head at training time (two_qubit --omega_min); "
                        "default matches the shipped KAK trio")
    p.add_argument("--kak_tokens", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="the checkpoint uses the full KAK featurization "
                        "(data/su4_targets.py::kak_input_tokens); default "
                        "matches the shipped KAK trio")
    p.add_argument("--best_phase", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="inference-time phase canonicalization: run the "
                        "model on all 4 SU(4) Z4 representatives per gate "
                        "and keep the best (fidelity is phase-invariant, "
                        "the featurization is not).  --no-best_phase "
                        "evaluates the textbook matrix as written")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    sigmas = [float(s) for s in args.sigmas.split(",")]
    system = SU4System(drive2=args.drive2)
    model_kw = dict(drive2=args.drive2, kak_features=args.kak_features,
                    kak_tokens=args.kak_tokens, omega_min=args.omega_min,
                    max_pulses=args.max_pulses, d_model=args.d_model,
                    n_layers=args.n_layers, n_heads=args.n_heads)

    gates = named_two_qubit_targets()
    names = list(gates)
    U = np.stack([gates[g] for g in names])            # (G, 4, 4) complex
    packed = SU4System.pack_target(U)                  # (G, 2, 4, 4)

    if args.best_phase:
        pulses = best_phase_pulses(args.checkpoint, U, system, **model_kw)
    else:
        pulses = model_gate_pulses(args.checkpoint, packed, **model_kw)
    table = eval_pulse_tables(pulses, packed, sigmas,
                              monte_carlo=args.monte_carlo,
                              epsilon_std=args.epsilon_std, system=system)

    rows = {}
    for i, g in enumerate(names):
        rows[g] = {"model": [float(v) for v in table[i]]}

    if args.polish:
        for i, g in enumerate(names):
            cfg = TwoQubitGrapeConfig(
                mode="blocks", n_starts=args.polish_starts,
                steps=args.polish_steps, drive2=args.drive2,
                sigmas=tuple(s for s in sigmas if s > 0))
            gp, info = multistart_grape_su4(U[i], cfg)
            tp = eval_pulse_tables(jnp.asarray(gp)[None], packed[i:i + 1],
                                   sigmas, monte_carlo=args.monte_carlo,
                                   epsilon_std=args.epsilon_std,
                                   system=system)
            rows[g]["grape"] = [float(v) for v in tp[0]]
            print(f"polished {g}: stages "
                  f"{[round(s['best_fid'], 4) for s in info['stages']]}")

    header = "| gate | " + " | ".join(
        f"E[F] σ={s:g}" for s in sigmas) + " |"
    lines = ["# Two-qubit named-gate evaluation", "",
             f"Universal model `{Path(args.checkpoint).name}`; "
             f"M={args.monte_carlo}, ε_std={args.epsilon_std}, CRN across σ.",
             "", header, "|" + "---|" * (len(sigmas) + 1)]
    for g in names:
        lines.append("| " + g + " | " + " | ".join(
            f"{v:.4f}" for v in rows[g]["model"]) + " |")
        if "grape" in rows[g]:
            lines.append("| " + g + " (GRAPE) | " + " | ".join(
                f"{v:.4f}" for v in rows[g]["grape"]) + " |")
    text = "\n".join(lines)
    print(text)

    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(text + "\n")
    if args.save_pulses:
        np.savez(args.save_pulses,
                 meta_json=json.dumps({"gates": names, "sigmas": sigmas,
                                       "fidelity": {g: rows[g] for g in
                                                    names}}),
                 **{f"pulses_{i}": np.asarray(pulses[i])
                    for i in range(len(names))})
        print(f"saved {args.save_pulses}")


if __name__ == "__main__":
    main()
