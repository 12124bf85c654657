"""SU(2) forward-kernel lever sweep (round 3, VERDICT item 5).

Measures the fused fidelity objective (bench.py's exact configuration:
B=8, L=20, M=2^20) across the remaining named levers:

* ``sincos``: "poly" (deg-9/8 minimax, the default) vs "poly_fast"
  (deg-7/6 — two fewer FMAs per segment, max err ~1e-5 vs libm)
* ``schedule``: "serial" (L dependent Hamilton products) vs "paired"
  (carry-chain length L/2, same op count — an ILP probe; expected ~flat
  because the (rows, 128) tile already gives 64 vregs of ILP per op)
* ``tile_rows``: the VMEM tile height (128 won round 2's sweep)

plus the hoisted-axis-norm variant note: the P=2 path already computes the
per-sample 1/sqrt(1+delta^2) ONCE outside the segment loop
(propagate_pallas.py::_segment_loop), so the ROADMAP's "fuse the rsqrt into
the sincos argument" lever is 2 ops per SAMPLE against ~700 per sample at
L=20 (<0.3%) — already harvested by the hoisting.

Timing protocol = bench.py: iterations chained inside one jitted lax.scan
with a data dependency, host round-trip subtracted via a 1-call program.

Usage: python benchmarks/su2_fwd_levers.py
"""

from __future__ import annotations

import itertools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from universal_quantum_optimal_control_tpu.core import su2
from universal_quantum_optimal_control_tpu.ops import propagate_pallas as pp

B, L, M = 8, 20, 1 << 20
ITERS = 16


def measure(sincos: str, schedule: str, tile_rows: int) -> float:
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pulses = jnp.stack(
        [jax.random.uniform(k1, (B, L), minval=-np.pi, maxval=np.pi),
         jax.random.uniform(k2, (B, L), minval=0.05, maxval=0.5)],
        axis=-1)
    delta = jax.random.normal(k3, (B, M))
    eps = jax.random.normal(k4, (B, M)) * 0.05
    q_target = su2.quat_normalize(
        jax.random.normal(jax.random.PRNGKey(7), (B, 4)))

    def obj(p, qt, d, e):
        return pp._mean_fid_raw(p, qt, d, e, tile_rows=tile_rows,
                                sincos=sincos, schedule=schedule)

    @jax.jit
    def run_chained(p, qt, d, e):
        def body(c, _):
            f = obj(p, qt, d + c, e)
            return jnp.mean(f) * 1e-12, f
        _, fs = lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return fs

    @jax.jit
    def run_one(p, qt, d, e):
        return obj(p, qt, d, e)

    _ = float(run_chained(pulses, q_target, delta, eps)[0, 0])
    _ = float(run_one(pulses, q_target, delta, eps)[0])
    t0 = time.perf_counter()
    _ = float(run_chained(pulses, q_target, delta, eps)[0, 0])
    t_full = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(run_one(pulses, q_target, delta, eps)[0])
    t_one = time.perf_counter() - t0
    dt = max((t_full - t_one) / (ITERS - 1), 1e-9)
    return B * M / dt


def main() -> None:
    results = {}
    for sincos, schedule in itertools.product(
            ("poly", "poly_fast"), ("serial", "paired")):
        v = measure(sincos, schedule, 128)
        results[f"{sincos}/{schedule}/tr128"] = v
        print(json.dumps({"lever": f"{sincos}/{schedule}/tr128",
                          "props_per_sec": round(v, 1)}), flush=True)
    best = max(results, key=results.get)
    sincos, schedule, _ = best.split("/")
    for tr in (64, 256):
        v = measure(sincos, schedule, tr)
        results[f"{sincos}/{schedule}/tr{tr}"] = v
        print(json.dumps({"lever": f"{sincos}/{schedule}/tr{tr}",
                          "props_per_sec": round(v, 1)}), flush=True)
    best = max(results, key=results.get)
    print(json.dumps({"best": best,
                      "props_per_sec": round(results[best], 1),
                      "vs_default": round(
                          results[best] / results["poly/serial/tr128"], 4)}))


if __name__ == "__main__":
    main()
