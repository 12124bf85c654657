r"""Export an Orbax training checkpoint as a shippable single-file ``.npz``.

The trainer writes per-band Orbax checkpoint directories
(``save_path/band{i}_delta{d}_eps{e}``); shipped demo artifacts are flat
float16 ``.npz`` files (``models/serialization.py``) registered in
``demo/app.py:MODEL_VARIANTS`` — the TPU-native replacement for the
reference's ``demo_universal/weight/*.pt`` blobs (.MISSING_LARGE_BLOBS).

Usage:
    python -m universal_quantum_optimal_control_tpu.workloads.export_npz \
        runs/length400_ft_r2:band2_delta1_eps0.05 \
        universal_quantum_optimal_control_tpu/demo/weights/length400.npz \
        [--dtype f16]
"""

from __future__ import annotations

import argparse

import numpy as np

from ..models.serialization import save_params_npz
from ..training.checkpoint import restore_checkpoint


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Orbax checkpoint -> npz export")
    p.add_argument("checkpoint", help="'dir:tag' Orbax checkpoint")
    p.add_argument("out", help="output .npz path")
    p.add_argument("--dtype", default="f16",
                   choices=["f16", "f32", "int8"],
                   help="stored dtype (f16 halves artifact size; int8 "
                        "quantizes matmul-sized tensors per output channel "
                        "and halves it again — measured matched-draw "
                        "per-gate E[F] impact <= 8.6e-4 on every shipped "
                        "single-qubit artifact and <= 2.0e-3 on the "
                        "two-qubit KAK trio, below the M=20k MC SE at "
                        "those fidelity levels; serving casts back to f32)")
    args = p.parse_args(argv)

    base_dir, tag = args.checkpoint.rsplit(":", 1)
    params, meta = restore_checkpoint(base_dir, tag)
    dtype = {"f16": np.float16, "f32": np.float32,
             "int8": "int8"}[args.dtype]
    save_params_npz(args.out, params, dtype=dtype)
    n = sum(np.asarray(x).size
            for x in __import__("jax").tree_util.tree_leaves(params))
    print(f"wrote {args.out} ({n} params, {args.dtype})"
          + (f"; metadata: {meta}" if meta else ""))


if __name__ == "__main__":
    main()
