"""Model tests: shapes, ranges, equivariance, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from universal_quantum_optimal_control_tpu.core import propagate, su2
from universal_quantum_optimal_control_tpu.data import build_su2_dataset
from universal_quantum_optimal_control_tpu.models import (
    GRAPE,
    Pipeline,
    UniversalQOCTransformer,
    normalize_pulse_space,
    rotation_vector_from_unitary,
)

PULSE_SPACE = normalize_pulse_space({"phi": (-3.15, 3.15), "tau": (0.1, 0.5)})


def tiny_model(**kw):
    defaults = dict(
        num_qubits=1, pulse_space=PULSE_SPACE, max_pulses=8,
        d_model=32, n_layers=2, n_heads=4, dropout=0.1, dtype=jnp.float32,
    )
    defaults.update(kw)
    return UniversalQOCTransformer(**defaults)


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model()
    rv = jnp.asarray([[1.0, 0.0, 0.0, np.pi]], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), rv)
    return model, params


def test_transformer_output_shape_and_ranges(model_and_params):
    model, params = model_and_params
    rv, _ = build_su2_dataset(jax.random.PRNGKey(1), 16, random=True)
    pulses = model.apply(params, rv)
    assert pulses.shape == (16, 8, 2)
    phi, tau = np.asarray(pulses[..., 0]), np.asarray(pulses[..., 1])
    assert np.all(phi > -np.pi - 1e-6) and np.all(phi <= np.pi + 1e-6)
    assert np.all(tau >= 0.1 - 1e-6) and np.all(tau <= 0.5 + 1e-6)


def test_transformer_phi_equivariance(model_and_params):
    """Rotating the target axis in the xy-plane shifts all output phases by
    the same azimuth (universal_model.py:141-143 design)."""
    model, params = model_and_params
    theta = 1.2
    rv_x = jnp.asarray([[1.0, 0.0, 0.5, theta]], jnp.float32)
    az = 0.8
    rv_rot = jnp.asarray(
        [[np.cos(az), np.sin(az), 0.5, theta]], jnp.float32
    )
    p_x = model.apply(params, rv_x)
    p_rot = model.apply(params, rv_rot)
    dphi = np.asarray(p_rot[..., 0] - p_x[..., 0])
    dphi = (dphi + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dphi, np.full_like(dphi, az), atol=1e-4)
    np.testing.assert_allclose(p_rot[..., 1], p_x[..., 1], atol=1e-5)


def test_transformer_gradient_flows_to_all_params(model_and_params):
    model, params = model_and_params
    rv, q_t = build_su2_dataset(jax.random.PRNGKey(2), 4, random=True)

    def loss(p):
        pulses = model.apply(p, rv)
        q = propagate.propagate_scan(pulses, jnp.zeros(4), jnp.zeros(4))
        return 1.0 - jnp.mean(su2.quat_fidelity(q, q_t))

    g = jax.grad(loss)(params)
    flat, _ = jax.tree_util.tree_flatten(g)
    # every parameter leaf receives a finite, not-all-zero gradient
    # (the reference's commented-out invariant — test.py:80-85)
    for leaf in flat:
        assert np.all(np.isfinite(np.asarray(leaf)))
    total = sum(float(jnp.sum(jnp.abs(l))) for l in flat)
    assert total > 0
    nonzero = sum(float(jnp.sum(jnp.abs(l))) > 0 for l in flat)
    assert nonzero >= len(flat) - 2  # allow e.g. unused bias edge cases


def test_transformer_finetune_requires_base_pulse():
    model = tiny_model(finetune=True)
    rv = jnp.asarray([[1.0, 0.0, 0.0, 1.0]], jnp.float32)
    with pytest.raises(ValueError):
        model.init(jax.random.PRNGKey(0), rv)
    base = jnp.zeros((1, 8, 2))
    params = model.init(jax.random.PRNGKey(0), rv, base_pulse=base)
    out = model.apply(params, rv, base_pulse=base)
    assert out.shape == (1, 8, 2)


def test_grape_shapes_and_ranges():
    model = GRAPE(pulse_space=normalize_pulse_space(
        {"phi": (-3.15, 3.15), "tau": (0.035, 0.07)}), num_pulses=20)
    rv = jnp.asarray([[1.0, 0.0, 0.0, np.pi]], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), rv)
    pulses = model.apply(params, rv)
    assert pulses.shape == (1, 20, 2)
    tau = np.asarray(pulses[..., 1])
    assert np.all(tau >= 0.035 - 1e-6) and np.all(tau <= 0.07 + 1e-6)


def test_grape_direct_mode_trains_toward_target():
    """Mini GRAPE slice: 30 adam steps on X(pi) at zero disorder must
    increase fidelity substantially."""
    import optax

    model = GRAPE(num_pulses=12, direct=True,
                  pulse_space=normalize_pulse_space(
                      {"phi": (-3.15, 3.15), "tau": (0.1, 0.5)}))
    rv = jnp.asarray([[1.0, 0.0, 0.0, np.pi]], jnp.float32)
    q_t = su2.rotation_vector_to_quat(rv)
    params = model.init(jax.random.PRNGKey(0), rv)
    opt = optax.adam(0.1)
    opt_state = opt.init(params)

    def loss_fn(p):
        pulses = model.apply(p, rv)
        q = propagate.propagate_scan(pulses, jnp.zeros(1), jnp.zeros(1))
        return 1.0 - jnp.mean(su2.quat_fidelity(q, q_t))

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, l

    l0 = float(loss_fn(params))
    for _ in range(30):
        params, opt_state, l = step(params, opt_state)
    assert float(l) < l0 * 0.5
    assert float(l) < 0.05


def test_pipeline_caches_and_unitary_roundtrip(model_and_params):
    model, params = model_and_params
    pipe = Pipeline(model, params)
    rv, q_t = build_su2_dataset(jax.random.PRNGKey(3), 4, random=True)
    p1 = pipe(rv)
    U = su2.quat_to_su2(q_t)
    rv_back = rotation_vector_from_unitary(U)
    # axis*angle recovered up to quaternion double cover
    q_back = su2.rotation_vector_to_quat(rv_back)
    dot = np.abs(np.sum(np.asarray(q_back) * np.asarray(q_t), axis=-1))
    np.testing.assert_allclose(dot, np.ones(4), atol=1e-5)
    p2 = pipe.forward_with_unitary(U)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)


def test_dataset_builder_grid_and_random():
    rv_g, q_g = build_su2_dataset(jax.random.PRNGKey(0), 100, random=False)
    assert rv_g.shape == (100, 4) and q_g.shape == (100, 4)
    rv_r, q_r = build_su2_dataset(jax.random.PRNGKey(0), 57, random=True)
    assert rv_r.shape == (57, 4)
    # axes are unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rv_r[:, :3]), axis=1), np.ones(57), atol=1e-5
    )
    # quaternions consistent with rotation vectors
    np.testing.assert_allclose(
        q_r, su2.rotation_vector_to_quat(rv_r), atol=1e-5
    )


def test_grape_direct_params_are_batch_independent():
    """Regression (ADVICE r1): direct-mode pulse table must not bind its
    shape to the init batch — init with 2 rows, apply with 100."""
    model = GRAPE(num_pulses=5, direct=True,
                  pulse_space=normalize_pulse_space(
                      {"phi": (-3.15, 3.15), "tau": (0.1, 0.5)}))
    rv2 = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0, np.pi]], jnp.float32), (2, 1))
    params = model.init(jax.random.PRNGKey(0), rv2)
    assert params["params"]["pulse_logits"].shape == (1, 5, 3)
    rv100 = jnp.tile(rv2[:1], (100, 1))
    pulses = model.apply(params, rv100)
    assert pulses.shape == (100, 5, 2)
    # broadcast: every row is the same table
    np.testing.assert_allclose(np.asarray(pulses[0]), np.asarray(pulses[99]))


def test_loose_npz_tree_cross_shape_encoder_transplant(tmp_path):
    """`load_params_npz_tree` + `transfer_encoder_params` must warm-start a
    model whose HEAD differs from the source (P=2 L=8 -> P=4 L=16) — the
    widened-pulse-space path `universal_single_qubit --pretrained_encoder`
    uses for the length-400 P=4 flagship (a strict template load cannot
    express this: head shapes differ)."""
    from universal_quantum_optimal_control_tpu.models.serialization import (
        load_params_npz_tree,
        save_params_npz,
    )
    from universal_quantum_optimal_control_tpu.models.two_qubit import (
        transfer_encoder_params,
    )

    rv = jnp.asarray([[1.0, 0.0, 0.0, np.pi]], jnp.float32)
    src_model = tiny_model()
    src_params = src_model.init(jax.random.PRNGKey(0), rv)
    path = str(tmp_path / "src.npz")
    save_params_npz(path, src_params)

    dst_model = tiny_model(
        max_pulses=16,
        pulse_space=normalize_pulse_space(
            {"Delta": (-5.0, 5.0), "Omega": (0.05, 1.0),
             "phi": (-3.15, 3.15), "tau": (0.1, 0.5)}))
    dst_params = dst_model.init(jax.random.PRNGKey(1), rv)

    src = load_params_npz_tree(path)
    merged = transfer_encoder_params(src, dst_params, also=("unitary_proj",))

    # every encoder block + unitary_proj now equals the source bit-for-bit
    for name in list(src["params"]):
        if not (name.startswith("encoder_") or name == "unitary_proj"):
            continue
        for a, b in zip(jax.tree_util.tree_leaves(src["params"][name]),
                        jax.tree_util.tree_leaves(merged["params"][name])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the head keeps the destination init (shapes differ from source)
    out = dst_model.apply(merged, rv)
    assert out.shape == (1, 16, 4)


def test_int8_npz_quantized_roundtrip(tmp_path):
    """save_params_npz(dtype='int8'): matmul-sized tensors come back within
    per-channel symmetric-int8 error (half-step of amax/127 per channel),
    small floats survive as f16, non-float leaves pass through exactly, and
    BOTH loaders (strict template + loose tree) dequantize transparently."""
    from universal_quantum_optimal_control_tpu.models.serialization import (
        load_params_npz,
        load_params_npz_tree,
        save_params_npz,
    )

    key = jax.random.PRNGKey(0)
    big = jax.random.normal(key, (64, 128), jnp.float32) * 0.3   # quantized
    bias = jnp.linspace(-1.0, 1.0, 16, dtype=jnp.float32)        # f16 path
    steps = jnp.asarray(7, jnp.int32)                            # pass-through
    tree = {"dense": {"kernel": big, "bias": bias}, "steps": steps}
    path = str(tmp_path / "q.npz")
    save_params_npz(path, tree, dtype="int8")

    raw = np.load(path)
    assert raw["dense//kernel"].dtype == np.int8
    assert raw["dense//kernel!scale"].dtype == np.float32
    assert raw["dense//bias"].dtype == np.float16
    assert raw["steps"].dtype == np.int32

    out = load_params_npz(path, tree)
    # per-output-channel half-step bound: |v - q*s| <= s/2, s = amax/127
    step = np.abs(np.asarray(big)).max(axis=0) / 127.0
    err = np.abs(np.asarray(out["dense"]["kernel"]) - np.asarray(big))
    assert (err <= 0.5 * step[None, :] + 1e-7).all(), err.max()
    np.testing.assert_allclose(np.asarray(out["dense"]["bias"]),
                               np.asarray(bias), atol=1e-3)
    loose = load_params_npz_tree(path)
    np.testing.assert_array_equal(np.asarray(loose["dense"]["kernel"]),
                                  np.asarray(out["dense"]["kernel"]))


@pytest.mark.artifacts
def test_int8_recast_of_shipped_flagship_preserves_ef(tmp_path):
    """Release gate for quantized shipping (VERDICT r3 item 4): the shipped
    flagship IS int8 since round 4, so the gate asserts (a) int8 re-encode
    is exactly idempotent (quantization is a projection: values are already
    q*scale, so requantizing reproduces the same q bit-for-bit), and
    (b) served E[F] on X(pi) at sigma_delta = 1 still matches the recorded
    f16-era measurement 0.9477 (demo/weights/README.md; the measured int8
    cast impact on this artifact was 2.0e-4, matched-draw table in the
    README)."""
    from pathlib import Path

    from universal_quantum_optimal_control_tpu.analysis import (
        mc_fidelity_estimate,
    )
    from universal_quantum_optimal_control_tpu.demo import app
    from universal_quantum_optimal_control_tpu.models.serialization import (
        load_params_npz_tree,
        save_params_npz,
    )

    src = Path(app.MODEL_VARIANTS["length_100"]["checkpoint"])
    dst = tmp_path / "length100_int8.npz"
    save_params_npz(str(dst), load_params_npz_tree(str(src)), dtype="int8")
    raw_src, raw_dst = np.load(str(src)), np.load(str(dst))
    q_keys = [k for k in raw_src.files if raw_src[k].dtype == np.int8]
    assert q_keys, "flagship artifact is expected to be int8-encoded"
    for k in q_keys:
        np.testing.assert_array_equal(raw_src[k], raw_dst[k])

    key = jax.random.PRNGKey(7)
    app.load_pipeline.cache_clear()
    p0, q = app.compute_pulses("length_100", 1.0, 0.0, 0.0, float(np.pi))
    app.load_pipeline.cache_clear()
    f0, _ = mc_fidelity_estimate(p0, q, delta_std=1.0, monte_carlo=8192,
                                 key=key)
    assert abs(float(f0) - 0.9477) < 6e-3, float(f0)
