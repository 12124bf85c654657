r"""Checkpointing — Orbax-backed parameter/metadata persistence.

Replaces the reference's ``torch.save(best_state)`` per error band
(universal_model_trainer.py:253-266) with Orbax PyTree checkpoints tagged by
curriculum band, plus JSON metadata (band params, best fidelity) so training
can resume at band granularity (SURVEY.md §5 checkpoint/resume plan).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "restore_checkpoint", "list_checkpoints"]


def _ckpt_dir(base: str, tag: str) -> Path:
    return Path(base).absolute() / tag


def save_checkpoint(base_dir: str, params: Any, tag: str,
                    metadata: Optional[Dict] = None) -> str:
    """Save a parameter pytree under ``base_dir/tag`` (overwrites)."""
    path = _ckpt_dir(base_dir, tag)
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path / "params", params, force=True)
    if metadata is not None:
        with open(path / "metadata.json", "w") as f:
            json.dump(metadata, f, indent=2, default=float)
    return str(path)


def restore_checkpoint(base_dir: str, tag: str,
                       target: Any = None) -> Tuple[Any, Optional[Dict]]:
    """Restore ``(params, metadata)`` from ``base_dir/tag``.

    ``target`` (an example pytree, e.g. from ``model.init``) restores with
    matching structure/dtypes; without it, raw arrays are returned.
    """
    import numpy as np

    path = _ckpt_dir(base_dir, tag)
    if not (path / "params").exists():
        avail = list_checkpoints(base_dir)
        raise FileNotFoundError(
            f"no checkpoint at {path / 'params'}; available tags in "
            f"{base_dir!r}: {avail}")
    ckptr = ocp.PyTreeCheckpointer()
    # Restore as plain numpy, then align with the target tree: restoring as
    # jax.Array ties leaves to the device sharding recorded at save time,
    # which breaks cross-backend restores (e.g. TPU-trained -> CPU analysis).
    meta = ckptr.metadata(path / "params")
    meta_tree = meta.item_metadata.tree
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree)
    params = ckptr.restore(path / "params", restore_args=restore_args)
    if target is not None:
        import jax.numpy as jnp
        params = jax.tree_util.tree_map(
            lambda t, r: jnp.asarray(r, dtype=t.dtype), target, params)
    meta_path = path / "metadata.json"
    metadata = None
    if meta_path.exists():
        with open(meta_path) as f:
            metadata = json.load(f)
    return params, metadata


def list_checkpoints(base_dir: str) -> list:
    base = Path(base_dir)
    if not base.exists():
        return []
    return sorted(p.name for p in base.iterdir() if (p / "params").exists())
