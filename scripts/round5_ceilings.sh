#!/usr/bin/env bash
# Round-5 part 3: sigma=0.2 KAK-tail GRAPE ceilings on the dumped
# percentile targets (b20 first — measured >= b10 on p10 in round 4 —
# then b10 as time allows).  Tail-first target order: the open question
# lives at p<=5.
set -u
cd "$(dirname "$0")/.."
SUP=scripts/tpu_supervisor.sh
log() { echo "=== $(date +%H:%M:%S) $*" >> runs/round5.log; }

for nb in 20 10; do
  for pct in 1 5 25 50; do
    tgt=$(ls runs/kak_targets/kak_p${pct}_i*.npz 2>/dev/null | head -1)
    [ -z "$tgt" ] && continue
    base=$(basename "$tgt" .npz)
    out="runs/ceiling02/${base}_b${nb}"
    [ -f "$out/result.json" ] && continue
    log "START ceil_${base}_b${nb}"
    bash $SUP "ceil_${base}_b${nb}" 360 1200 8 -- python -u -m universal_quantum_optimal_control_tpu.workloads.two_qubit_grape \
      --target_npz "$tgt" --drive2 --sigmas 0.05,0.1,0.15,0.2 \
      --n_blocks $nb --steps 3000 --n_starts 24 \
      --curve_sigmas 0.2 --curve_mc 8192 --out "$out"
    log "END ceil_${base}_b${nb} rc=$?"
  done
done
log "CEILINGS DONE"
