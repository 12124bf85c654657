"""Summarize runs/ceiling02/*/result.json into the 5-point KAK-tail
ceiling table (docs/two_qubit_results.md round-5 section).

Usage: env PYTHONPATH= JAX_PLATFORMS=cpu has no effect here — pure host.
    python scripts/ceiling_table.py [runs/ceiling02]
"""

import json
import sys
from pathlib import Path

root = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/ceiling02")
rows = {}
for rj in sorted(root.glob("*/result.json")):
    d = json.loads(rj.read_text())
    name = rj.parent.name              # kak_p<P>_i<IDX>_b<NB>
    base, nb = name.rsplit("_b", 1)
    curve = {float(s): (m, se) for s, m, se in d["curve"]}
    ef02 = curve.get(0.2, (float("nan"), 0.0))
    tgt = d["config"].get("target_npz", "")
    rows.setdefault(base, {"target": tgt})[f"b{nb}"] = ef02[0]
    rows[base][f"b{nb}_se"] = ef02[1]
    rows[base][f"b{nb}_exact"] = d["info"].get("exact_fid_of_best")

import numpy as np  # noqa: E402

print(f"{'target':22s} {'model':>7s} {'b10':>7s} {'b20':>7s} "
      f"{'ceiling':>8s} {'gap':>7s}")
for base in sorted(rows, key=lambda b: float(b.split('_')[1][1:])):
    r = rows[base]
    model = np.nan
    if r["target"] and Path(r["target"]).exists():
        model = float(np.load(r["target"])["model_fid"])
    b10, b20 = r.get("b10", np.nan), r.get("b20", np.nan)
    ceil = np.nanmax([b10, b20])
    print(f"{base:22s} {model:7.4f} {b10:7.4f} {b20:7.4f} {ceil:8.4f} "
          f"{model - ceil:+7.4f}")
