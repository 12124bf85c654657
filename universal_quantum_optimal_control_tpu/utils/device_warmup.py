"""Device / D2H channel warmup for long unattended CLI runs.

The axon TPU tunnel's FIRST device->host read in a process is heavy-tailed:
usually 30-60 s, but with measurable probability it wedges indefinitely
(observed round 5 — the compute stream keeps working while the first
result fetch never returns).  Long-running CLIs therefore:

* print a ``device warm`` sentinel line once a trivial jit + host read has
  round-tripped, so an external supervisor can kill + restart the process
  if the sentinel does not appear within a deadline, and
* register SIGUSR1 -> faulthandler so a watcher can dump all thread stacks
  of a silent process and see WHERE it sits.

This is orchestration around an environment defect, not a workaround baked
into library code — core/ops modules stay clean.
"""

from __future__ import annotations

import faulthandler
import signal
import sys
import time

__all__ = ["warm_device", "mark"]


def mark(tag: str, msg: str) -> None:
    """One flushed, timestamped progress line on stderr."""
    print(f"[{tag} {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def warm_device(tag: str) -> None:
    """Register the SIGUSR1 stack-dumper and round-trip one scalar D2H.

    Prints ``warming device + D2H channel`` before and ``device warm``
    after — the latter is the supervisor's liveness sentinel
    (scripts/tpu_supervisor.sh).
    """
    try:
        faulthandler.register(signal.SIGUSR1, all_threads=True)
    except (ValueError, AttributeError):  # non-main thread / platform quirk
        pass

    import jax
    import jax.numpy as jnp

    mark(tag, "warming device + D2H channel")
    value = float(jax.jit(lambda x: x.sum())(jnp.ones(8)))
    assert value == 8.0, value
    mark(tag, "device warm")
