r"""Per-op accounting for the drive2-vs-base SU(4) fused-kernel gap.

Round-3 measured the drive2 product-seeded value_and_grad at 7.9e6 vs the
base system's 1.31e7 props/s (BENCHMARKS.md) and attributed the 1.66× to
"2 extra transcendentals + φ₂ coupling algebra per segment" WITHOUT the
accounting.  The accounting says that can't be it: per segment the
product-seeded VJP runs ~26 SoA 4×4 complex matmuls (~11.6k VPU ops over
the sample tile), while drive2 adds 2 scalar transcendentals, ~10 scalar
FLOPs, ~12 per-sample vector ops, one extra tile reduction and one extra
SMEM accumulate — ≤2% of the work.  This script isolates where the time
actually goes:

  * fwd:       base vs drive2 fused forward objective
  * bwd:       base vs drive2 product-seeded VJP kernel alone
  * e2e:       base vs drive2 value_and_grad through the custom_vjp pair

Run on a quiet chip: ``python benchmarks/su4_drive2_levers.py``.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, iters=8):
    fn(0.0)[0].block_until_ready()           # compile + warm
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(float(i) * 1e-7)[0]
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main() -> None:
    from universal_quantum_optimal_control_tpu.ops.propagate_su4_pallas import (  # noqa: E501
        mean_fidelity_su4_pallas,
        mean_fidelity_su4_pallas_with_product,
    )
    from universal_quantum_optimal_control_tpu.ops.propagate_su4_pallas_bwd import (  # noqa: E501
        mean_fidelity_su4_trainable,
        su4_objective_vjp_from_product,
    )

    B, L, M = 8, 24, 1 << 14
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 8)
    d1 = jax.random.normal(ks[0], (B, M)) * 0.2
    d2 = jax.random.normal(ks[1], (B, M)) * 0.2
    ep = jax.random.normal(ks[2], (B, M)) * 0.05
    A = rng.normal(size=(B, 4, 4)) + 1j * rng.normal(size=(B, 4, 4))
    Qt = np.stack([np.linalg.qr(a)[0] for a in A]).astype(np.complex64)
    t_r = jnp.asarray(Qt.real, jnp.float32)
    t_i = jnp.asarray(Qt.imag, jnp.float32)
    gbar = jnp.ones((B,), jnp.float32)

    def pulses_for(P):
        cols = [jax.random.uniform(ks[3], (B, L), minval=-np.pi,
                                   maxval=np.pi)]
        if P == 4:
            cols.append(jax.random.uniform(ks[4], (B, L), minval=-np.pi,
                                           maxval=np.pi))
        cols.append(jax.random.uniform(ks[5], (B, L), minval=0.1,
                                       maxval=1.0))
        cols.append(jax.random.uniform(ks[6], (B, L), minval=0.1,
                                       maxval=0.5))
        return jnp.stack(cols, axis=-1)

    p3, p4 = pulses_for(3), pulses_for(4)
    rows = []

    def record(name, dt):
        row = {"benchmark": name, "ms": round(dt * 1e3, 3),
               "props_per_s": round(B * M / dt, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    for tag, p, drive2 in (("base", p3, False), ("drive2", p4, True)):
        def fwd(c, p=p, drive2=drive2):
            return (jnp.sum(mean_fidelity_su4_pallas(
                p, t_r, t_i, d1 + c, d2, ep, drive2=drive2)), None)
        record(f"fwd_{tag}", timed(fwd))

        def fwd_prod(c, p=p, drive2=drive2):
            f, prod = mean_fidelity_su4_pallas_with_product(
                p, t_r, t_i, d1 + c, d2, ep, drive2=drive2)
            return (jnp.sum(f) + jnp.sum(prod) * 0.0, prod)
        record(f"fwd_with_product_{tag}", timed(fwd_prod))

        _, prod = fwd_prod(0.0)
        prod.block_until_ready()

        def bwd(c, p=p, drive2=drive2, prod=prod):
            dp, dd1, dd2, de = su4_objective_vjp_from_product(
                p, t_r, t_i, d1 + c, d2, ep, gbar, prod, drive2=drive2)
            return (jnp.sum(dp), None)
        record(f"bwd_product_seeded_{tag}", timed(bwd))

        def vg(c, p=p, drive2=drive2):
            def f(q):
                return jnp.sum(mean_fidelity_su4_trainable(
                    q, t_r, t_i, d1 + c, d2, ep, drive2=drive2))
            v, g = jax.value_and_grad(f)(p)
            return (v + jnp.sum(g) * 0.0, None)
        record(f"value_and_grad_{tag}", timed(vg))

    print(json.dumps({"device": str(jax.devices()[0]),
                      "shape": f"B={B},L={L},M={M}"}))


if __name__ == "__main__":
    main()
