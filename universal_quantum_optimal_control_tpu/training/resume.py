r"""Mid-run resume — full training state checkpointing.

The reference only persists best weights per curriculum band
(universal_model_trainer.py:253-266) — a crash mid-band loses the band.
Here the FULL state (params, optimizer state, curriculum position, epoch,
PRNG key, best-so-far) round-trips through Orbax, so training resumes
exactly where it stopped (SURVEY.md §5 checkpoint/resume plan).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["TrainState", "save_train_state", "restore_train_state",
           "latest_step"]


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    best_params: Any
    key: jax.Array
    band_idx: int = 0
    epoch: int = 0
    best_fid: float = 0.0
    extra: Dict[str, Any] = field(default_factory=dict)


def _state_dir(base: str, step: int) -> Path:
    return Path(base).absolute() / f"state_{step:08d}"


def save_train_state(base_dir: str, state: TrainState, step: int) -> str:
    """Persist the full state under ``base_dir/state_{step}``."""
    path = _state_dir(base_dir, step)
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    tree = {"params": state.params, "opt_state": state.opt_state,
            "best_params": state.best_params, "key": state.key}
    ckptr.save(path / "tree", tree, force=True)
    meta = {"band_idx": state.band_idx, "epoch": state.epoch,
            "best_fid": state.best_fid, "extra": state.extra, "step": step}
    with open(path / "meta.json", "w") as f:
        json.dump(meta, f, indent=2, default=float)
    return str(path)


def latest_step(base_dir: str) -> Optional[int]:
    base = Path(base_dir)
    if not base.exists():
        return None
    steps = [int(p.name.split("_")[1]) for p in base.iterdir()
             if p.name.startswith("state_") and (p / "meta.json").exists()]
    return max(steps) if steps else None


def restore_train_state(base_dir: str, step: Optional[int] = None,
                        target: Optional[Dict] = None) -> TrainState:
    """Restore the full state (latest step by default)."""
    if step is None:
        step = latest_step(base_dir)
        if step is None:
            raise FileNotFoundError(f"no train state under {base_dir}")
    path = _state_dir(base_dir, step)
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        restore_args = jax.tree_util.tree_map(
            lambda x: ocp.ArrayRestoreArgs(dtype=np.asarray(x).dtype), target)
        tree = ckptr.restore(path / "tree", item=target,
                             restore_args=restore_args)
    else:
        tree = ckptr.restore(path / "tree")
    with open(path / "meta.json") as f:
        meta = json.load(f)
    key = jnp.asarray(tree["key"], dtype=jnp.uint32)
    return TrainState(
        params=tree["params"], opt_state=tree["opt_state"],
        best_params=tree["best_params"], key=key,
        band_idx=int(meta["band_idx"]), epoch=int(meta["epoch"]),
        best_fid=float(meta["best_fid"]), extra=meta.get("extra", {}),
    )
