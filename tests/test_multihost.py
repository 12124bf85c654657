"""2-process DCN test: ``init_distributed`` + ``make_mesh`` + sharded step.

The reference has no distributed story at all (SURVEY §2.4); our multi-host
path (``parallel/mesh.py:init_distributed``) was previously untested.  This
spawns two real processes with 2 virtual CPU devices each, forms the global
``(data=2, mc=2)`` mesh over Gloo, and checks the sharded objective AND its
gradient equal the unsharded single-process computation.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_mesh_objective_and_grad():
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=str(REPO), JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "mp_worker.py"),
             str(i), str(port)],
            env=env, cwd=str(REPO), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    results = {}
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker hung (coordinator/Gloo)")
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        r = json.loads(line)
        results[r["pid"]] = r

    assert set(results) == {0, 1}
    # both processes observe the same global value
    assert results[0]["value"] == results[1]["value"]
    for r in results.values():
        # sharded pmean objective == unsharded mean
        np.testing.assert_allclose(r["value"], r["ref"], atol=1e-5)
        # gradient through the collective == local gradient
        assert r["grad_max_err"] < 1e-5, r
        np.testing.assert_allclose(r["grad_norm"], r["grad_ref_norm"],
                                   rtol=1e-5)
