r"""Two-qubit entangling-gate training — CLI entry point.

Implements BASELINE.json configs[4] (the workload the reference README
advertises at README.md:87 but ships no code for): SU(4) propagation with
cross-talk + per-qubit off-resonant disorder, curriculum over σ, optional
finetune from a single-qubit checkpoint (encoder transfer).

Targets: a batch of entangling gates built from ZZ interactions and local
rotations (CZ-class), packed as (re, im) pairs.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ..core import su4
from ..models import normalize_pulse_space
from ..models.two_qubit import TwoQubitQOCTransformer, transfer_encoder_params
from ..training import CurriculumBand, MetricsLogger, TrainConfig, Trainer
from ..training.checkpoint import restore_checkpoint
from ..training.systems import SU4System


def build_targets(key: jax.Array, n: int,
                  system: su4.TwoQubitSystem, mode: str = "products",
                  phase_augment: bool = False,
                  edge_frac: float = 0.0) -> jax.Array:
    """Entangling targets packed ``(n, 2, 4, 4)``.

    ``mode="products"``: zero-disorder propagations of random pulse
    sequences (guaranteed inside the system's reachable set; on the
    ``drive2`` system the sequences use its 4-parameter space).
    ``mode="kak"``: Weyl-chamber-box KAK constructions
    (:func:`..data.su4_targets.kak_targets`) — covers the CZ/CNOT/iSWAP
    edge classes that random products essentially never visit.
    ``mode="mixed"``: half and half.
    ``phase_augment``: multiply every target by a random global phase —
    physics-neutral, teaches the featurization phase invariance (the
    measured failure mode of the products-only round-2 model on textbook
    gates; docs/two_qubit_results.md §Named-gate coverage).
    """
    if mode not in ("products", "kak", "mixed"):
        raise ValueError(f"unknown target mode {mode!r}")
    # NOTE: pass a CPU-resident key (see main(): keys are built under
    # jax.default_device(cpu)) — the numpy seed below is a host scalar
    # read, and the axon tunnel's first device->host read from a detached
    # process can stall for minutes (observed round 5).  threefry is
    # bit-identical across backends, so a CPU-resident key reproduces the
    # exact target sets the old device-resident path generated.
    rng = np.random.default_rng(
        int(jax.random.randint(key, (), 0, 2**31 - 1)))
    n_kak = {"products": 0, "kak": n, "mixed": n // 2}[mode]

    parts = []
    if n - n_kak > 0:
        m = n - n_kak
        k1, k2, k3, k4 = jax.random.split(key, 4)
        cols = [jax.random.uniform(k1, (m, 24), minval=-np.pi, maxval=np.pi)]
        if system.drive2:
            cols.append(jax.random.uniform(k3, (m, 24), minval=-np.pi,
                                           maxval=np.pi))
            cols.append(jax.random.uniform(k4, (m, 24), minval=0.0,
                                           maxval=1.0))
        cols.append(jax.random.uniform(k2, (m, 24), minval=0.1, maxval=0.5))
        # the key may be CPU-committed (see the seed note above), which
        # commits the uniforms to CPU — push the pulse table to the default
        # (accelerator) device so the propagation compiles there
        pulses = jax.device_put(jnp.stack(cols, axis=-1), jax.devices()[0])
        Ur, Ui = su4.propagate_su4(pulses, jnp.zeros(m), jnp.zeros(m),
                                   jnp.zeros(m), system)
        parts.append(np.asarray(Ur) + 1j * np.asarray(Ui))
    if n_kak > 0:
        from ..data.su4_targets import kak_targets
        parts.append(kak_targets(rng, n_kak, edge_frac=edge_frac))

    U = np.concatenate(parts, axis=0)
    if phase_augment:
        from ..data.su4_targets import random_global_phase
        U = random_global_phase(rng, U)
    return SU4System.pack_target(U)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train two-qubit pulse model")
    p.add_argument("--num_epoch", type=int, default=500)
    p.add_argument("--save_path", type=str, default="weights/two_qubit")
    p.add_argument("--max_pulses", type=int, default=40)
    p.add_argument("--d_model", type=int, default=512)
    p.add_argument("--n_layers", type=int, default=8)
    p.add_argument("--n_heads", type=int, default=16)
    p.add_argument("--xtalk", type=float, default=0.1)
    p.add_argument("--coupling", type=float, default=0.5)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--monte_carlo", type=int, default=256)
    p.add_argument("--learning_rate", type=float, default=3e-5)
    p.add_argument("--train_size", type=int, default=256)
    p.add_argument("--eval_size", type=int, default=64)
    p.add_argument("--fused_epoch", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="scan minibatches on-device per epoch (default "
                        "on; --no-fused_epoch for per-step stepping)")
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                   help="encoder compute dtype (f32 default for training — "
                        "bf16 under the fused scan degrades convergence)")
    p.add_argument("--pretrained_single_qubit", type=str, default=None,
                   help="checkpoint dir:tag of a single-qubit model whose "
                        "encoder is transplanted before finetuning")
    p.add_argument("--transfer_also", type=str, default="",
                   help="comma list of extra top-level modules to transplant "
                        "alongside the encoder blocks when shapes match "
                        "(e.g. 'unitary_proj' for a two-qubit -> two-qubit "
                        "warm start across max_pulses, or "
                        "'unitary_proj,head' for the n_layers capacity probe "
                        "where the head geometry is unchanged)")
    p.add_argument("--restore", type=str, default=None,
                   help="TWO-QUBIT weights to restore full params from "
                        "before training: either a checkpoint dir:tag of an "
                        "Orbax run, or a path ending in .npz to warm-start "
                        "from flat npz weights (e.g. the shipped "
                        "universal_quantum_optimal_control_tpu/demo/weights/"
                        "two_qubit_d2_kak_s0.npz) — lets curriculum bands "
                        "run as separate invocations (fresh cosine schedule "
                        "+ MC budget per band)")
    p.add_argument("--seed", type=int, default=0)
    # the recipe that unlocked the single-qubit d512x8 flagship
    p.add_argument("--reset_opt_per_band", action="store_true",
                   help="fresh Adam moments at each curriculum band")
    p.add_argument("--shuffle", action="store_true",
                   help="re-draw minibatch composition each epoch")
    p.add_argument("--recover_collapse", type=float, default=0.0,
                   help="mid-band collapse recovery threshold (0 = off)")
    p.add_argument("--state_every", type=int, default=0,
                   help="checkpoint FULL resume state every N epochs")
    p.add_argument("--resume", action="store_true",
                   help="continue from the latest full resume state under "
                        "save_path (written by --state_every); a fresh "
                        "save_path starts normally — together these make "
                        "supervised kill-and-restart loops cheap on a "
                        "flaky device tunnel")
    p.add_argument("--tail_focus", type=float, default=0.0,
                   help="if > 0: CVaR training — average the loss over only "
                        "the worst this-fraction of per-target E[F] in each "
                        "minibatch (e.g. 0.25). Targets the KAK-tail, whose "
                        "hardness is structureless in Cartan/local-factor "
                        "features so it cannot be curated by sampling")
    p.add_argument("--tail_weight", type=float, default=1.0,
                   help="CVaR mixture weight w: loss = (1-w)*mean-loss + "
                        "w*CVaR (1.0 = pure CVaR; 0.5 keeps the mean "
                        "anchored while adding tail pressure)")
    p.add_argument("--pulse_params", type=int, default=2, choices=[2, 3],
                   help="2 = (phi, tau); 3 = (phi, Omega, tau) amplitude "
                        "control — Omega -> 0 expresses free-ZZ evolution, "
                        "the resource that makes CZ reachable (see "
                        "optimizers/two_qubit_grape.py)")
    p.add_argument("--backend", default="xla", choices=["xla", "pallas"],
                   help="objective path: autodiff through the SoA scan, or "
                        "the fused Pallas forward + reverse-sweep VJP "
                        "kernels")
    p.add_argument("--target_mode", default="products",
                   choices=["products", "kak", "mixed"],
                   help="training-target distribution: random reachable "
                        "pulse products, Weyl-chamber KAK constructions "
                        "(cover the CZ/CNOT/iSWAP edge classes), or half "
                        "each (data/su4_targets.py)")
    p.add_argument("--edge_frac", type=float, default=0.0,
                   help="fraction of KAK targets drawn with U-shaped "
                        "Beta(0.3, 0.3) Cartan coordinates — concentrates "
                        "coverage on the Weyl-chamber corners/edges (the "
                        "iSWAP corner is vanishingly rare under the uniform "
                        "box; data/su4_targets.py::kak_targets)")
    p.add_argument("--phase_augment", action="store_true",
                   help="random global phase on every target — teaches the "
                        "raw-matrix featurization the phase invariance the "
                        "fidelity already has")
    p.add_argument("--lr_schedule", default="constant",
                   choices=["constant", "cosine"],
                   help="cosine = 5%% linear warmup then cosine decay to "
                        "10%%, per band (with --reset_opt_per_band).  The "
                        "post-LN d512x8 encoder falls into the constant-"
                        "output attractor without warmup on hard target "
                        "sets (docs/two_qubit_results.md)")
    p.add_argument("--omega_min", type=float, default=0.0,
                   help="lower edge of the Omega channel's range map (3- and "
                        "4-parameter spaces).  A small floor (e.g. 0.05) "
                        "removes the Omega=0 no-drive fixed point that "
                        "collapses universal training on hard target sets "
                        "(phi gradients vanish when nothing drives)")
    p.add_argument("--drive2", action="store_true",
                   help="system variant: direct drive line on qubit 2 with "
                        "symmetric cross-talk and 4-parameter (phi1, phi2, "
                        "Omega, tau) pulses — delta2 becomes refocusable, "
                        "lifting the chi-cross-talk robustness ceiling "
                        "(docs/two_qubit_results.md §Falsification)")
    p.add_argument("--kak_features", action="store_true",
                   help="append a token with the target's Makhlin/KAK local "
                        "invariants (the SU(4) analog of the SCORE "
                        "embedding's rotation-class featurization)")
    p.add_argument("--kak_tokens", action="store_true",
                   help="FULL KAK featurization: host-decompose every "
                        "target into (A1, A2, Cartan c, B1, B2) and feed "
                        "those as input tokens (data/su4_targets.py::"
                        "kak_input_tokens) -- the two-qubit analog of the "
                        "reference's YXY+SCORE embedding; fixes the "
                        "raw-entry underfit on KAK-mixed target sets")
    p.add_argument("--curriculum", default="0.2,0.4,0.7",
                   help="comma-separated delta_std curriculum bands.  The "
                        "universal SU(4) inversion task benefits from a "
                        "clean sigma=0 first band (learn the control map "
                        "before robustness), e.g. '0,0.2,0.4'")
    return p


def main(argv=None) -> None:
    from ..utils.device_warmup import mark, warm_device

    def _mark(msg: str) -> None:
        mark("two_qubit", msg)

    args = build_parser().parse_args(argv)
    system = SU4System(xtalk=args.xtalk, coupling=args.coupling,
                       backend=args.backend, drive2=args.drive2)

    space = {"phi": (-3.15, 3.15), "tau": (0.1, 0.5)}
    if args.pulse_params == 3:
        space = {"phi": (-3.15, 3.15), "omega": (args.omega_min, 1.0),
                 "tau": (0.1, 0.5)}
    if args.drive2:
        # the drive2 system's declared 4-parameter space (core/su4.py)
        space = {"phi1": (-3.15, 3.15), "phi2": (-3.15, 3.15),
                 "omega": (args.omega_min, 1.0), "tau": (0.1, 0.5)}
    model = TwoQubitQOCTransformer(
        pulse_space=normalize_pulse_space(space),
        max_pulses=args.max_pulses, d_model=args.d_model,
        n_layers=args.n_layers, n_heads=args.n_heads,
        dtype=jnp.float32 if args.dtype == "f32" else jnp.bfloat16,
        kak_features=args.kak_features, kak_tokens=args.kak_tokens,
    )

    # data keys live on CPU: the target-build path reads a host scalar from
    # them (numpy seed), and the first tunnel D2H from a detached process
    # can stall for minutes.  threefry is backend-identical, so the target
    # sets are unchanged.
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        key = jax.random.PRNGKey(args.seed)
        k1, k2 = jax.random.split(key)

    # warm the device->host channel once, visibly, before any data work
    warm_device("two_qubit")
    _mark("building train targets")
    train_t = build_targets(k1, args.train_size, system.system,
                            mode=args.target_mode,
                            phase_augment=args.phase_augment,
                            edge_frac=args.edge_frac)
    _mark("building eval targets")
    eval_t = build_targets(k2, args.eval_size, system.system,
                           mode=args.target_mode,
                           phase_augment=args.phase_augment,
                           edge_frac=args.edge_frac)
    train_x, eval_x = train_t, eval_t
    if args.kak_tokens:
        from ..data.su4_targets import kak_input_tokens

        def tokens_of(packed):
            U = (np.asarray(packed[:, 0], np.float64)
                 + 1j * np.asarray(packed[:, 1], np.float64))
            return jnp.asarray(kak_input_tokens(U))

        train_x, eval_x = tokens_of(train_t), tokens_of(eval_t)

    _mark("targets built")
    cfg = TrainConfig(
        monte_carlo=args.monte_carlo, batch_size=args.batch_size,
        epochs=args.num_epoch, learning_rate=args.learning_rate,
        lr_schedule=args.lr_schedule,
        lr_schedule_steps=args.num_epoch * max(
            args.train_size // args.batch_size, 1),
        loss="sharp", seed=args.seed, fused_epoch=args.fused_epoch,
        reset_optimizer_per_band=args.reset_opt_per_band,
        shuffle=args.shuffle, recover_collapse=args.recover_collapse,
        state_every=args.state_every, tail_focus=args.tail_focus,
        tail_weight=args.tail_weight,
    )
    trainer = Trainer(model, cfg, system=system)

    _mark("init_params")
    params = trainer.init_params(train_x[:2])
    if args.restore:
        if args.restore.endswith(".npz"):
            # warm-start from a shipped two-qubit artifact (e.g.
            # universal_quantum_optimal_control_tpu/demo/weights/
            # two_qubit_d2_kak_s0.npz) — Orbax run dirs don't survive
            # across environments, the flat npz weights do.
            from ..models.serialization import load_params_npz

            params = load_params_npz(args.restore, params)
        else:
            base_dir, tag = args.restore.rsplit(":", 1)
            params, _ = restore_checkpoint(base_dir, tag, target=params)
        print(f"restored two-qubit params from {args.restore}")
    if args.pretrained_single_qubit:
        if args.pretrained_single_qubit.endswith(".npz"):
            # a shipped single-qubit artifact (e.g. demo/weights/length100.npz).
            # Tree (template-free) load: transfer_encoder_params copies every
            # shape-matching encoder block, so the source geometry need not
            # equal the destination's (e.g. an 8-layer d512 flagship into a
            # 12-layer two-qubit model transplants encoder_0..7 and leaves
            # the rest at init — the round-5 capacity-probe path).
            from ..models.serialization import load_params_npz_tree

            single_params = load_params_npz_tree(
                args.pretrained_single_qubit)
        else:
            base_dir, tag = args.pretrained_single_qubit.rsplit(":", 1)
            single_params, _ = restore_checkpoint(base_dir, tag)
        also = tuple(m for m in args.transfer_also.split(",") if m)
        params = transfer_encoder_params(single_params, params, also=also)
        print(f"transferred encoder from {args.pretrained_single_qubit}")

    _mark("entering train loop")
    curriculum = [CurriculumBand(float(d))
                  for d in args.curriculum.split(",") if d != ""]

    with MetricsLogger(path=f"{args.save_path}/metrics.csv",
                       echo=True) as logger:
        params, history = trainer.train(
            train_x, train_t, eval_x, eval_t,
            curriculum=curriculum, params=params,
            save_dir=args.save_path, logger=logger, resume=args.resume)

    best = max(b["best_fid"] for b in history["bands"])
    print(f"done; best eval fidelity across bands: {best:.4f}")


if __name__ == "__main__":
    main()
