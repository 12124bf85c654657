"""Benchmark suite — honest device-side timings for the framework's hot paths.

Prints one JSON line per benchmark.  All timings chain iterations inside one
jitted program with a data dependency and subtract the host round trip (see
bench.py) — naive host loops overstate throughput badly on remote-device
backends.

Usage:  python benchmarks/run_benchmarks.py  (runs on the default device)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed_chain(make_step, iters=12):
    """Time `iters` chained evaluations of make_step(carry) -> (carry, out)."""
    @jax.jit
    def run_full():
        c, _ = lax.scan(lambda c, _: make_step(c), jnp.float32(0.0), None,
                        length=iters)
        return c

    @jax.jit
    def run_one():
        c, _ = make_step(jnp.float32(0.0))
        return c

    _ = float(run_full())
    _ = float(run_one())
    t0 = time.perf_counter(); _ = float(run_full()); t_full = time.perf_counter() - t0
    t0 = time.perf_counter(); _ = float(run_one()); t_one = time.perf_counter() - t0
    return max((t_full - t_one) / (iters - 1), 1e-9)


def su2_inputs(B, L, M, key=0):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(key), 4)
    pulses = jnp.stack(
        [jax.random.uniform(k1, (B, L), minval=-np.pi, maxval=np.pi),
         jax.random.uniform(k2, (B, L), minval=0.05, maxval=0.5)], axis=-1)
    delta = jax.random.normal(k3, (B, M))
    eps = jax.random.normal(k4, (B, M)) * 0.05
    return pulses, delta, eps


def main() -> None:
    from universal_quantum_optimal_control_tpu.core import propagate, su2, su4
    from universal_quantum_optimal_control_tpu.ops import mean_fidelity_pallas
    from universal_quantum_optimal_control_tpu.ops.propagate_pallas_bwd import (
        propagate_mc_vjp_pallas,
    )

    results = []

    def record(name, value, unit, **extra):
        row = {"benchmark": name, "value": round(value, 1), "unit": unit,
               **extra}
        results.append(row)
        print(json.dumps(row), flush=True)

    # 1. fused forward+fidelity kernel (headline)
    B, L, M = 8, 20, 1 << 20
    pulses, delta, eps = su2_inputs(B, L, M)
    qt = su2.quat_normalize(jax.random.normal(jax.random.PRNGKey(7), (B, 4)))

    def step_pallas(c):
        f = mean_fidelity_pallas(pulses, qt, delta + c, eps)
        return jnp.mean(f) * 1e-12, None

    dt = timed_chain(step_pallas)
    record("su2_L20_pallas_fused_objective", B * M / dt, "props/s",
           shape=f"B={B},L={L},M={M}")

    # 2. XLA scan objective (same workload)
    def step_xla(c):
        q = propagate.propagate_mc(pulses, delta + c, eps)
        f = jnp.mean(su2.quat_fidelity(q, qt[:, None, :]), axis=1)
        return jnp.mean(f) * 1e-12, None

    dt = timed_chain(step_xla)
    record("su2_L20_xla_scan_objective", B * M / dt, "props/s")

    # 3. fused backward kernel (pulse+disorder cotangents)
    g = jax.random.normal(jax.random.PRNGKey(9), (B, 1 << 16, 4))
    pulses2, delta2, eps2 = su2_inputs(B, L, 1 << 16, key=1)

    def step_bwd(c):
        dp, dd, de = propagate_mc_vjp_pallas(pulses2, delta2 + c, eps2, g)
        return jnp.sum(dp) * 1e-12, None

    dt = timed_chain(step_bwd)
    record("su2_L20_pallas_fused_vjp", B * (1 << 16) / dt, "props/s")

    # 4. objective value+grad, pallas fwd+bwd vs pure XLA
    def vg(fn):
        def step(c):
            def loss(p):
                return fn(p, delta2 + c, eps2)
            l, gr = jax.value_and_grad(loss)(pulses2)
            return l * 1e-12 + jnp.sum(gr) * 0.0, None
        return step

    def obj_pallas(p, d, e):
        return jnp.mean(mean_fidelity_pallas(p, qt, d, e))

    def obj_xla(p, d, e):
        q = propagate.propagate_mc(p, d, e)
        return jnp.mean(su2.quat_fidelity(q, qt[:, None, :]))

    dt = timed_chain(vg(obj_pallas))
    record("su2_L20_value_and_grad_pallas", B * (1 << 16) / dt, "props/s")
    dt = timed_chain(vg(obj_xla))
    record("su2_L20_value_and_grad_xla", B * (1 << 16) / dt, "props/s")

    # 5. SU(4) two-qubit MC propagation: XLA in both layouts.  The trailing
    # (..., 4, 4) layout tiles the matrix onto (4, 128) lanes (4/128 live →
    # it is the round-1 baseline, kept for the record at its best M); the
    # SoA (16, batch) layout puts MC samples on lanes.
    B4, L4 = 8, 24
    M4x, M4p = 2048, 1 << 16
    p4, d1, e4 = su2_inputs(B4, L4, M4p, key=2)
    d2 = jax.random.normal(jax.random.PRNGKey(3), (B4, M4p))
    system = su4.TwoQubitSystem()

    def step_su4(c):
        Ur, Ui = su4.propagate_su4_mc(p4, d1[:, :M4x] + c, d2[:, :M4x],
                                      e4[:, :M4x], system, layout="ri")
        return jnp.mean(Ur) * 1e-12, None

    dt = timed_chain(step_su4, iters=4)
    record("su4_L24_xla_ri_mc_propagation", B4 * M4x / dt, "props/s")

    def step_su4_soa(c):
        Ur, Ui = su4.propagate_su4_mc(p4, d1 + c, d2, e4, system,
                                      layout="soa")
        return jnp.mean(Ur) * 1e-12, None

    dt = timed_chain(step_su4_soa, iters=8)
    record("su4_L24_xla_soa_mc_propagation", B4 * M4p / dt, "props/s")

    # 6. SU(4) fused Pallas kernel (SoA layout, MC on lanes)
    from universal_quantum_optimal_control_tpu.ops import (
        propagate_su4_mc_pallas,
    )

    def step_su4_pallas(c):
        Ur, Ui = propagate_su4_mc_pallas(p4, d1 + c, d2, e4,
                                         xtalk=system.xtalk,
                                         coupling=system.coupling)
        return jnp.mean(Ur) * 1e-12, None

    dt = timed_chain(step_su4_pallas, iters=8)
    record("su4_L24_pallas_mc_propagation", B4 * M4p / dt, "props/s")

    # 7. SU(4) training objective: fused fwd+bwd kernels vs XLA autodiff
    from universal_quantum_optimal_control_tpu.ops.propagate_su4_pallas_bwd import (  # noqa: E501
        mean_fidelity_su4_trainable,
    )

    M4g = 1 << 14
    rng = np.random.default_rng(0)
    A = rng.normal(size=(B4, 4, 4)) + 1j * rng.normal(size=(B4, 4, 4))
    Qt = np.stack([np.linalg.qr(a)[0] for a in A]).astype(np.complex64)
    t_r = jnp.asarray(Qt.real, jnp.float32)
    t_i = jnp.asarray(Qt.imag, jnp.float32)

    def vg_su4_pallas(c):
        def f(p):
            return jnp.sum(mean_fidelity_su4_trainable(
                p, t_r, t_i, d1[:, :M4g] + c, d2[:, :M4g], e4[:, :M4g]))
        v, g = jax.value_and_grad(f)(p4)
        return v * 1e-12 + jnp.sum(g) * 1e-12, None

    def vg_su4_xla(c):
        def f(p):
            Ur, Ui = su4.propagate_su4_mc(p, d1[:, :M4g] + c, d2[:, :M4g],
                                          e4[:, :M4g], system)
            F = su4.fidelity_su4_ri(Ur, Ui, t_r[:, None], t_i[:, None])
            return jnp.sum(jnp.mean(F, axis=1))
        v, g = jax.value_and_grad(f)(p4)
        return v * 1e-12 + jnp.sum(g) * 1e-12, None

    dt = timed_chain(vg_su4_pallas, iters=6)
    record("su4_L24_value_and_grad_pallas", B4 * M4g / dt, "props/s")
    dt = timed_chain(vg_su4_xla, iters=6)
    record("su4_L24_value_and_grad_xla_soa", B4 * M4g / dt, "props/s")

    # 8. SU(4) drive2 training objective (4-parameter pulses, second direct
    # drive line) through the same fused kernels — the round-4 scalar-width
    # envelope combination makes this rate-match the base system
    kphi2 = jax.random.PRNGKey(7)
    p4d2 = jnp.concatenate(
        [p4[..., :1],
         jax.random.uniform(kphi2, (B4, L4, 1), minval=-np.pi, maxval=np.pi),
         jnp.ones((B4, L4, 1), jnp.float32) * 0.8,
         p4[..., 1:2]], axis=-1)

    def vg_su4_pallas_d2(c):
        def f(p):
            return jnp.sum(mean_fidelity_su4_trainable(
                p, t_r, t_i, d1[:, :M4g] + c, d2[:, :M4g], e4[:, :M4g],
                drive2=True))
        v, g = jax.value_and_grad(f)(p4d2)
        return v * 1e-12 + jnp.sum(g) * 1e-12, None

    dt = timed_chain(vg_su4_pallas_d2, iters=6)
    record("su4_L24_drive2_value_and_grad_pallas", B4 * M4g / dt, "props/s")

    print(json.dumps({"device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
