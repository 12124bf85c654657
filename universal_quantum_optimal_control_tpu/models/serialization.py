r"""Compact parameter serialization — single-file ``.npz`` weights.

Orbax checkpoints are directories; for shipping small pretrained artifacts in
the repo (the reference ships ``demo_universal/weight/*.pt`` blobs —
.MISSING_LARGE_BLOBS) a flat npz with ``/``-joined tree paths is friendlier.
Dtypes are preserved (optionally downcast to f16 for size).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_params_npz", "load_params_npz", "load_params_npz_tree"]

_SEP = "//"


def _flatten(params: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = _SEP.join(
            getattr(p, "key", None) or getattr(p, "name", None) or str(p.idx)
            if hasattr(p, "idx") or hasattr(p, "key") or hasattr(p, "name")
            else str(p)
            for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_params_npz(path: str, params: Any, dtype=None) -> None:
    """Save a parameter pytree as one .npz (tree paths as keys)."""
    flat = _flatten(params)
    if dtype is not None:
        flat = {k: v.astype(dtype) for k, v in flat.items()}
    np.savez_compressed(path, **flat)


def load_params_npz_tree(path: str, dtype=jnp.float32) -> Dict[str, Any]:
    """Load a .npz saved by :func:`save_params_npz` as a nested dict WITHOUT
    a target structure (keys are ``//``-joined tree paths, so the nesting is
    recoverable).  For partial/shape-tolerant uses — e.g. encoder transplants
    between models whose heads differ (P=2 → P=4, L=100 → L=400), where a
    strict :func:`load_params_npz` template cannot be built."""
    data = np.load(path)
    tree: Dict[str, Any] = {}
    for key in data.files:
        node = tree
        parts = key.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key], dtype=dtype)
    return tree


def load_params_npz(path: str, target: Any, dtype=jnp.float32) -> Any:
    """Load a .npz saved by :func:`save_params_npz` into ``target``'s
    structure (shapes must match; dtype is cast to ``dtype``)."""
    data = np.load(path)
    flat_target = jax.tree_util.tree_flatten_with_path(target)
    leaves = []
    for path_t, leaf in flat_target[0]:
        key = _SEP.join(
            getattr(p, "key", None) or getattr(p, "name", None) or str(p.idx)
            if hasattr(p, "idx") or hasattr(p, "key") or hasattr(p, "name")
            else str(p)
            for p in path_t)
        if key not in data:
            raise KeyError(f"missing weight {key!r} in {path}")
        arr = data[key]
        if arr.shape != np.asarray(leaf).shape:
            raise ValueError(
                f"shape mismatch for {key!r}: {arr.shape} vs "
                f"{np.asarray(leaf).shape}")
        leaves.append(jnp.asarray(arr, dtype=dtype))
    return jax.tree_util.tree_unflatten(flat_target[1], leaves)
