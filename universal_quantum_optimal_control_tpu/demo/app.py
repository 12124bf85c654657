r"""Interactive demo — serve trained universal models.

TPU-native equivalent of the reference Gradio app (demo_universal/app.py):
pick a model variant, specify a target rotation (axis + angle), and get the
pulse table (CSV), fidelity contour, pulse-parameter plot, fidelity-vs-σ
curve, and a Bloch evolution video.

Fixes vs the reference: models are instantiated and weights loaded ONCE and
cached (the reference reloads on every button click — app.py:65-69), and all
evaluations run jitted.

Gradio is optional in this image; without it, ``main()`` falls back to a CLI
that renders the same artifacts to a directory.
"""

from __future__ import annotations

import argparse
import functools
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from ..core.su2 import rotation_vector_to_quat
from ..models import Pipeline, UniversalQOCTransformer, normalize_pulse_space
from ..training.checkpoint import restore_checkpoint
from ..utils import load_model_params

_CONFIG_DIR = Path(__file__).parent.parent / "configs"

_WEIGHTS_DIR = Path(__file__).parent / "weights"

MODEL_VARIANTS: Dict[str, Dict] = {
    # shipped pretrained artifacts (trained in-repo; see weights/README.md)
    "length_100_med": {
        "config": str(_CONFIG_DIR /
                      "universal_single_qubit_length100_med.json"),
        "checkpoint": str(_WEIGHTS_DIR / "length100_med.npz")},
    "small_20": {"config": str(_CONFIG_DIR /
                               "universal_single_qubit_small20.json"),
                 "checkpoint": str(_WEIGHTS_DIR / "small20.npz")},
    "length_100": {"config": str(_CONFIG_DIR / "universal_single_qubit.json"),
                   "checkpoint": str(_WEIGHTS_DIR / "length100.npz")},
    "length_400": {"config": str(_CONFIG_DIR /
                                 "universal_single_qubit_length400.json"),
                   "checkpoint": str(_WEIGHTS_DIR / "length400.npz"),
                   # blend variants serve as 0.2*model + base (reference
                   # length_400.json "finetune" semantics, universal_model.py
                   # :135-138 — but the base loads ONCE here, not per forward)
                   "base_pulse": str(_WEIGHTS_DIR / "grape_x400_pulse.csv")},
    # per-gate finetuned pulse tables (workloads/finetune_gates.py): serves
    # the polished table for exact named-gate requests, the flagship model
    # for everything else
    "length_100_gates": {
        "config": str(_CONFIG_DIR / "universal_single_qubit.json"),
        "checkpoint": str(_WEIGHTS_DIR / "length100.npz"),
        "gate_bundle": str(_WEIGHTS_DIR / "length100_gates.npz")},
    # the UNIVERSAL model in the reference's full declared 4-parameter
    # space (test.py:16-18): beats the P=2 flagship at every curriculum
    # band (0.9943/0.9863/0.9629 vs 0.9936/0.9802/0.9500)
    "length_100_p4": {
        "config": str(_CONFIG_DIR / "universal_single_qubit_p4.json"),
        "checkpoint": str(_WEIGHTS_DIR / "length100_p4.npz")},
    # the 4-parameter (φ, Ω, Δ, τ) per-gate polish of the P=4 universal
    # flagship — the best single-target tables in the repo (0.9630–0.9643
    # at σ=1 vs the P=2 GRAPE ceiling 0.9536–0.9558); falls back to the
    # P=4 universal model for non-named requests
    "length_100_gates_p4": {
        "config": str(_CONFIG_DIR / "universal_single_qubit_p4.json"),
        "checkpoint": str(_WEIGHTS_DIR / "length100_p4.npz"),
        "gate_bundle": str(_WEIGHTS_DIR / "length100_gates_p4.npz")},
    # the 4-parameter universal model at the reference's L=400 budget
    # (τ ∈ (−0.5, 0.5), relu-zeroable segments — reference length_400.json
    # semantics, minus the blend: no base pulse needed at P=4).  Bands
    # 0.9968/0.9853/0.9581 vs the P=2 blend's 0.9980/0.9844/0.9566
    # (better at σ ≥ 0.7, and universal without a base pulse)
    "length_400_p4": {
        "config": str(_CONFIG_DIR / "universal_single_qubit_length400_p4.json"),
        "checkpoint": str(_WEIGHTS_DIR / "length400_p4.npz")},
}


# Two-qubit demo variants (VERDICT r2 item 6: serve the SU(4) artifacts).
# "model" variants run the shipped universal TwoQubitQOCTransformer on a
# named gate; "pulse" variants render a shipped single-target pulse table.
TWO_QUBIT_VARIANTS: Dict[str, Dict] = {
    # (the original chi-only-system artifact two_qubit_d512.npz was pruned
    # in round 4 — strictly dominated by the drive2 KAK trio below;
    # reproduce via docs/two_qubit_results.md §Universal two-qubit model)
    # round-3 flagship: drive2 system + KAK-mixed targets + kak_tokens
    # featurization — named edge-class gates (CZ/CNOT/iSWAP) now serve at
    # high fidelity (docs/two_qubit_results.md §Named-gate coverage)
    # round 5: the L=100 time-budget retrain (T ~ 30 vs the old L=40 trio's
    # ~15) — blended 0.9510 at sigma=0.2 (was 0.8925), named gates
    # 0.9582-0.9813 at sigma=0.2 (docs/two_qubit_results.md §Round 5)
    "two_qubit_d2_kak": {
        "checkpoint": str(_WEIGHTS_DIR / "two_qubit_d2_kak.npz"),
        "drive2": True, "kak_tokens": True, "omega_min": 0.05,
        "max_pulses": 100},
    # exact-serving band of the flagship (sigma_delta=0-trained, 16k
    # targets): named gates 0.9912-0.9996 exact, blended 0.9867 over
    # arbitrary mixed targets — use for sigma < 0.05 requests
    "two_qubit_d2_kak_s0": {
        "checkpoint": str(_WEIGHTS_DIR / "two_qubit_d2_kak_s0.npz"),
        "drive2": True, "kak_tokens": True, "omega_min": 0.05},
    # deep-disorder band of the flagship (sigma_delta=0.4 band of the 32k
    # chain since round 4) — the better server for sigma >= 0.35: beats the
    # flagship's extension there on all five named gates (flagship
    # 0.6155-0.7180 vs this 0.7061-0.8202 at sigma=0.4 — docs/
    # two_qubit_results.md §The 32k probe)
    "two_qubit_d2_kak_s04": {
        "checkpoint": str(_WEIGHTS_DIR / "two_qubit_d2_kak_s04.npz"),
        "drive2": True, "kak_tokens": True, "omega_min": 0.05,
        "max_pulses": 100},
    # per-gate finetuned SU(4) tables (workloads/finetune_two_qubit_gates):
    # serves the polished/GRAPE table for named-gate requests, the flagship
    # model for everything else (the two-qubit analog of length_100_gates)
    "two_qubit_gates": {
        "checkpoint": str(_WEIGHTS_DIR / "two_qubit_d2_kak.npz"),
        "drive2": True, "kak_tokens": True, "omega_min": 0.05,
        "max_pulses": 100,
        "gate_bundle": str(_WEIGHTS_DIR / "two_qubit_gates.npz")},
    "cz_robust": {"pulse_npz": str(_WEIGHTS_DIR / "cz_robust_pulse.npz")},
    # the dephasing-bound falsification pulse (direct drive on qubit 2)
    "cz_drive2": {"pulse_npz": str(_WEIGHTS_DIR / "cz_drive2_pulse.npz"),
                  "drive2": True},
}

_PULSE_COLS = {2: ["phi", "tau"], 3: ["phi", "omega", "tau"],
               4: ["phi1", "phi2", "omega", "tau"]}


def render_two_qubit_artifacts(variant: str, gate: str, out_dir: str,
                               monte_carlo: int = 2000,
                               n_delta: int = 61) -> Dict[str, str]:
    """Render the SU(4) artifact set: pulse CSV, F(δ₁, δ₂) contour surface,
    E[F](σ_δ) sweep (``analysis/plots_su4.py``).  Returns file paths."""
    import csv

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..analysis.plots_su4 import (
        fidelity_by_std_su4,
        fidelity_contour_plot_su4,
    )
    from ..core import su4
    from ..training.systems import SU4System

    spec = TWO_QUBIT_VARIANTS[variant]
    system = su4.TwoQubitSystem(drive2=spec.get("drive2", False))
    if "pulse_npz" in spec:
        data = np.load(spec["pulse_npz"])
        pulses, u_target = data["pulses"], data["u_target"]
        label = variant
    else:
        from ..optimizers.two_qubit_grape import named_two_qubit_targets

        targets = named_two_qubit_targets()
        if gate not in targets:
            raise ValueError(f"unknown gate {gate!r}; "
                             f"available: {sorted(targets)}")
        u_target = targets[gate]
        label = f"{variant}:{gate}"
        bundle_path = spec.get("gate_bundle")
        if bundle_path and Path(bundle_path).exists():
            from ..workloads.finetune_two_qubit_gates import (
                load_two_qubit_gate_bundle,
            )
            tables, _ = load_two_qubit_gate_bundle(bundle_path)
        else:
            tables = {}
        if gate in tables:
            pulses = np.asarray(tables[gate])
        else:
            from ..workloads.two_qubit_eval import model_gate_pulses

            packed = SU4System.pack_target(u_target[None])
            model_kw = {k: spec[k] for k in
                        ("drive2", "kak_features", "kak_tokens", "omega_min",
                         "max_pulses", "d_model", "n_layers", "n_heads")
                        if k in spec}
            pulses = np.asarray(
                model_gate_pulses(spec["checkpoint"], packed, **model_kw)[0])

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = {"csv": str(out / "pulses.csv")}
    with open(paths["csv"], "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(_PULSE_COLS[pulses.shape[-1]])
        w.writerows(np.asarray(pulses).tolist())

    paths["contour"] = str(out / "contour_d1d2.png")
    fidelity_contour_plot_su4(pulses, u_target, system,
                              save_path=paths["contour"], title=label,
                              n_delta=n_delta)

    stds, mean, se = fidelity_by_std_su4(
        pulses, u_target, system, stds=np.arange(0.02, 0.42, 0.02),
        monte_carlo=monte_carlo)
    paths["fidelity"] = str(out / "fid_by_std.png")
    fig, ax = plt.subplots(figsize=(6.0, 4.0))
    ax.errorbar(stds, mean, yerr=se, lw=1.2)
    ax.set_xlabel(r"$\sigma_\delta$ (both qubits)")
    ax.set_ylabel("E[F]")
    ax.set_title(f"{label}  two-qubit robustness")
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(paths["fidelity"], dpi=120)
    plt.close(fig)
    return paths


@functools.lru_cache(maxsize=4)
def load_pipeline(variant: str, checkpoint: Optional[str] = None,
                  random_init: bool = False) -> Pipeline:
    """Build and cache a Pipeline for a model variant."""
    spec = MODEL_VARIANTS[variant]
    model_params = load_model_params(spec["config"])
    model_params["pulse_space"] = normalize_pulse_space(
        model_params["pulse_space"])
    base_pulse = None
    if spec.get("base_pulse"):
        from ..workloads.universal_single_qubit import load_base_pulse
        base_pulse = load_base_pulse(spec["base_pulse"])
    model_params["finetune"] = base_pulse is not None
    model = UniversalQOCTransformer(**model_params)

    rv0 = np.asarray([[1.0, 0.0, 0.0, np.pi]], np.float32)
    init_kwargs = {"base_pulse": base_pulse} if base_pulse is not None else {}
    target = jax.jit(functools.partial(model.init, **init_kwargs))(
        jax.random.PRNGKey(0), rv0)
    ckpt = checkpoint or spec["checkpoint"]
    if ckpt is not None and str(ckpt).endswith(".npz"):
        from ..models.serialization import load_params_npz
        params = load_params_npz(str(ckpt), target)
    elif ckpt is not None:
        base_dir, tag = ckpt.rsplit(":", 1)
        params, _ = restore_checkpoint(base_dir, tag, target=target)
    elif random_init:
        params = target
    else:
        raise ValueError(f"no checkpoint registered for variant {variant}; "
                         "pass checkpoint='dir:tag' / a .npz path, or "
                         "random_init=True")
    return Pipeline(model, params, base_pulse=base_pulse)


def _gate_bundle_lookup(variant: str, rv: np.ndarray):
    """If the variant ships per-gate finetuned tables and the request matches
    a named gate (axis + angle within 1e-5), return its polished table."""
    spec = MODEL_VARIANTS[variant]
    path = spec.get("gate_bundle")
    if not path or not Path(path).exists():
        return None
    from ..workloads.finetune_gates import load_gate_bundle

    tables, meta = load_gate_bundle(path)
    for name, gate_rv in zip(meta["gates"], meta["rotation_vectors"]):
        if np.allclose(rv[0], np.asarray(gate_rv, np.float32), atol=1e-5):
            return tables[name]
    return None


def compute_pulses(variant: str, x: float, y: float, z: float, theta: float,
                   checkpoint: Optional[str] = None,
                   random_init: bool = False):
    """Rotation spec → (pulses (L, 2), target quaternion) — reference
    ``compute_pulse_and_unitary`` (app.py:50-72)."""
    n = np.asarray([x, y, z], np.float64)
    n = n / max(np.linalg.norm(n), 1e-12)
    rv = np.asarray([[n[0], n[1], n[2], theta]], np.float32)
    pulses = _gate_bundle_lookup(variant, rv)
    if pulses is None:
        pipe = load_pipeline(variant, checkpoint, random_init)
        pulses = np.asarray(pipe(rv)[0])
    return pulses, rotation_vector_to_quat(rv[0])


def render_artifacts(variant: str, x: float, y: float, z: float, theta: float,
                     out_dir: str, checkpoint: Optional[str] = None,
                     random_init: bool = False, monte_carlo: int = 10000,
                     video: bool = True) -> Dict[str, str]:
    """Render the full artifact set for one target; returns file paths."""
    import csv

    from ..analysis.bloch import animate_bloch_ensemble
    from ..analysis.plots import (
        fidelity_contour_plot,
        plot_fidelity_by_std,
        plot_pulse_param,
    )

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    pulses, q_target = compute_pulses(variant, x, y, z, theta, checkpoint,
                                      random_init)

    paths = {"csv": str(out / "pulses.csv")}
    # single-qubit channel order across P ∈ {2, 3, 4} (core/propagate.py)
    su2_cols = {2: ["phi", "tau"], 3: ["phi", "omega", "tau"],
                4: ["phi", "omega", "delta", "tau"]}
    with open(paths["csv"], "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(su2_cols[pulses.shape[-1]])
        w.writerows(pulses.tolist())

    paths["contour"] = str(out / "contour.png")
    fidelity_contour_plot(pulses, q_target, save_path=paths["contour"],
                          title=f"θ={theta:.3f}", monte_carlo=monte_carlo)
    paths["params"] = str(out / "params.png")
    plot_pulse_param(pulses, save_path=paths["params"])
    plot_fidelity_by_std(pulses, q_target, save_prefix=str(out / "fid"),
                         monte_carlo=monte_carlo)
    paths["fidelity"] = str(out / "fid_fidelity.png")
    if video:
        # returns the ACTUAL saved path (falls back to .gif without ffmpeg)
        paths["video"] = animate_bloch_ensemble(
            pulses, q_target, n_samples=12,
            save_path=str(out / "evolution.mp4"))
    return paths


def launch_gradio(checkpoints: Dict[str, str], share: bool = False):
    """Gradio UI (reference app.py:176-196) — requires gradio installed."""
    import gradio as gr  # gated import

    for k, v in checkpoints.items():
        MODEL_VARIANTS[k]["checkpoint"] = v

    def run(variant, x, y, z, theta):
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            paths = render_artifacts(variant, x, y, z, theta, td)
            return (paths["csv"], paths["contour"], paths["params"],
                    paths["fidelity"], paths.get("video"))

    demo = gr.Interface(
        fn=run,
        inputs=[
            gr.Dropdown(list(MODEL_VARIANTS), value="length_100",
                        label="model"),
            gr.Slider(-1, 1, value=1.0, label="n_x"),
            gr.Slider(-1, 1, value=0.0, label="n_y"),
            gr.Slider(-1, 1, value=0.0, label="n_z"),
            gr.Slider(0, float(np.pi), value=float(np.pi), label="θ"),
        ],
        outputs=[gr.File(label="pulse CSV"), gr.Image(label="contour"),
                 gr.Image(label="pulse params"),
                 gr.Image(label="fidelity vs σ"), gr.Video(label="evolution")],
        title="Universal Quantum Optimal Control (TPU)",
    )
    demo.launch(share=share)
    return demo


def default_variant() -> str:
    """The flagship variant if its weights ship, else the best shipped one —
    so the README quickstart (no flags) always works."""
    for name in ("length_100", "length_100_med", "small_20"):
        if MODEL_VARIANTS[name]["checkpoint"] is not None:
            return name
    return "length_100_med"


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="QOC demo")
    p.add_argument("--variant", default=default_variant(),
                   choices=list(MODEL_VARIANTS))
    p.add_argument("--checkpoint", default=None, help="'dir:tag'")
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--axis", default="1,0,0")
    p.add_argument("--theta", type=float, default=float(np.pi))
    p.add_argument("--out", default="demo_out")
    p.add_argument("--monte_carlo", type=int, default=10000)
    p.add_argument("--no-video", action="store_true")
    p.add_argument("--serve", action="store_true",
                   help="launch the Gradio UI (requires gradio)")
    p.add_argument("--two_qubit", default=None,
                   choices=list(TWO_QUBIT_VARIANTS),
                   help="render SU(4) artifacts for a two-qubit variant "
                        "instead of the single-qubit set")
    p.add_argument("--gate", default="cz",
                   help="named two-qubit gate for --two_qubit model variants")
    args = p.parse_args(argv)

    if args.two_qubit:
        paths = render_two_qubit_artifacts(
            args.two_qubit, args.gate, args.out,
            monte_carlo=min(args.monte_carlo, 4096))
        for k, v in paths.items():
            print(f"{k}: {v}")
        return

    if args.serve:
        try:
            ckpts = ({args.variant: args.checkpoint}
                     if args.checkpoint else {})
            launch_gradio(ckpts)
            return
        except ImportError:
            print("gradio not installed — falling back to CLI rendering")

    x, y, z = (float(v) for v in args.axis.split(","))
    paths = render_artifacts(args.variant, x, y, z, args.theta, args.out,
                             checkpoint=args.checkpoint,
                             random_init=args.random_init,
                             monte_carlo=args.monte_carlo,
                             video=not args.no_video)
    for k, v in paths.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
