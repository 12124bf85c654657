"""Multi-process (DCN) worker — spawned by ``test_multihost.py``.

Each process owns 2 virtual CPU devices; 2 processes form a global 4-device
``(data=2, mc=2)`` mesh through ``init_distributed`` (the SURVEY §2.3/§2.4
multi-host story: ``data`` rides DCN across hosts, ``mc`` stays within-host).
Computes the sharded mean-fidelity objective and its pulse gradient, and
prints them with a locally computed unsharded reference for the parent test
to compare.
"""

import json
import sys

import numpy as np


def main() -> None:
    pid, port = int(sys.argv[1]), sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from universal_quantum_optimal_control_tpu.parallel.mesh import (
        DATA_AXIS,
        MC_AXIS,
        init_distributed,
        make_mesh,
    )

    init_distributed(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())
    assert len(jax.local_devices()) == 2

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from universal_quantum_optimal_control_tpu.training.systems import (
        SU2System,
        make_objective,
    )

    mesh = make_mesh(data=2, mc=2)
    system = SU2System("xla")
    objective = make_objective(mesh, system.local_mean_fidelity)

    # identical inputs on every process (global-array construction contract)
    rng = np.random.default_rng(0)
    B, L, M = 8, 10, 64
    pulses = np.stack(
        [rng.uniform(-np.pi, np.pi, (B, L)), rng.uniform(0.1, 0.5, (B, L))],
        axis=-1).astype(np.float32)
    qt = rng.normal(size=(B, 4)).astype(np.float32)
    qt /= np.linalg.norm(qt, axis=1, keepdims=True)
    delta = (rng.normal(size=(B, M)) * 0.4).astype(np.float32)
    eps = (rng.normal(size=(B, M)) * 0.05).astype(np.float32)

    def gshard(x, *axes):
        sh = NamedSharding(mesh, P(*axes))
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    p_g = gshard(pulses, DATA_AXIS)
    qt_g = gshard(qt, DATA_AXIS)
    d_g = gshard(delta, DATA_AXIS, MC_AXIS)
    e_g = gshard(eps, DATA_AXIS, MC_AXIS)

    rep = NamedSharding(mesh, P())
    val = jax.jit(objective, out_shardings=rep)(p_g, qt_g, (d_g, e_g))

    # gradient through the pmean reduction (the training direction)
    grad_fn = jax.jit(jax.grad(objective), out_shardings=rep)
    g = grad_fn(p_g, qt_g, (d_g, e_g))

    # unsharded local reference on this process's device 0
    f_local = system.local_mean_fidelity(
        jnp.asarray(pulses), jnp.asarray(qt), (jnp.asarray(delta),
                                               jnp.asarray(eps)))
    ref = float(jnp.mean(f_local))
    g_ref = jax.grad(lambda p: jnp.mean(system.local_mean_fidelity(
        p, jnp.asarray(qt), (jnp.asarray(delta), jnp.asarray(eps)))))(
            jnp.asarray(pulses))

    print(json.dumps({
        "pid": pid,
        "value": float(val),
        "ref": ref,
        "grad_norm": float(jnp.linalg.norm(g)),
        "grad_ref_norm": float(jnp.linalg.norm(g_ref)),
        "grad_max_err": float(jnp.max(jnp.abs(g - g_ref))),
    }), flush=True)


if __name__ == "__main__":
    main()
