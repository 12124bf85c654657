#!/usr/bin/env bash
# Round-5 queue, part 2: the 12-layer capacity probe + the sigma=0.2
# KAK-tail ceilings, b20 parameterization first (round 4 measured b20 >=
# b10 on the p10 target, so a time-boxed partial pass still yields a full
# 5-row table; b10 rows refine "best-of" if time allows).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
SUP=scripts/tpu_supervisor.sh
W=universal_quantum_optimal_control_tpu/demo/weights
COMMON="--train_size 16384 --eval_size 128 --batch_size 32 \
  --learning_rate 1e-4 --lr_schedule cosine --backend pallas \
  --reset_opt_per_band --shuffle --recover_collapse 0.05 \
  --target_mode mixed --phase_augment --kak_tokens --drive2 --omega_min 0.05 \
  --state_every 25 --resume"
log() { echo "=== $(date +%H:%M:%S) $*" >> runs/round5.log; }

log "START tq12L_b0"
bash $SUP tq12L_b0 360 900 10 -- python -u -m universal_quantum_optimal_control_tpu.workloads.two_qubit \
  $COMMON --n_layers 12 --max_pulses 40 --curriculum "0" --num_epoch 300 --monte_carlo 256 \
  --pretrained_single_qubit $W/two_qubit_d2_kak_s0.npz --transfer_also unitary_proj,head \
  --save_path runs/tq12L_b0
log "END tq12L_b0 rc=$?"

log "START tq12L_b2"
bash $SUP tq12L_b2 360 900 10 -- python -u -m universal_quantum_optimal_control_tpu.workloads.two_qubit \
  $COMMON --n_layers 12 --max_pulses 40 --curriculum "0.2" --num_epoch 250 --monte_carlo 1024 \
  --restore runs/tq12L_b0:band0_delta0_eps0.05 \
  --save_path runs/tq12L_b2
log "END tq12L_b2 rc=$?"

log "START dump02"
# calibration percentile targets are defined on the ROUND-4 L=40 flagship's
# per-target distribution (recovered from git history: the shipped npz is
# the L=100 retrain since round 5) — VERDICT item 3 widens THAT calibration
bash $SUP dump02 360 900 10 -- python -u -m universal_quantum_optimal_control_tpu.analysis.two_qubit_split_eval \
  runs/old_flagship_l40.npz --sigma 0.2 --drive2 --kak_tokens --omega_min 0.05 \
  --max_pulses 40 --dump_kak_percentiles 1,5,25,50 --dump_dir runs/kak_targets \
  --per_target_csv runs/flagship_l40_per_target_s02.csv --channels_worst_decile
log "END dump02 rc=$?"

for nb in 20 10; do
  for tgt in runs/kak_targets/kak_p*.npz; do
    base=$(basename "$tgt" .npz)
    log "START ceil_${base}_b${nb}"
    bash $SUP "ceil_${base}_b${nb}" 360 1200 8 -- python -u -m universal_quantum_optimal_control_tpu.workloads.two_qubit_grape \
      --target_npz "$tgt" --drive2 --sigmas 0.05,0.1,0.15,0.2 \
      --n_blocks $nb --steps 3000 --n_starts 24 \
      --curve_sigmas 0.2 --curve_mc 8192 --out "runs/ceiling02/${base}_b${nb}"
    log "END ceil_${base}_b${nb} rc=$?"
  done
done

log "PART2 DONE"
