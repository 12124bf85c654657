"""Driver contract tests: entry() jits and runs; dryrun_multichip executes a
sharded training step on the virtual 8-device CPU mesh."""

import sys
from pathlib import Path

import jax
import pytest
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    pulses, mean_fid = out
    assert pulses.shape[0] == args[1].shape[0]
    assert pulses.shape[-1] == 2
    assert np.all(np.isfinite(np.asarray(pulses)))
    assert 0.0 < float(mean_fid) <= 1.0


@pytest.mark.slow
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
