#!/usr/bin/env bash
# Round-5 compute queue (one v5e chip, strictly sequential, supervised).
#
# Three experiments from VERDICT r4 (docs/two_qubit_results.md round-5
# sections hold the measured outcomes):
#   A. Time budget: the KAK trio retrained at L=100 (T box 10-50 vs the
#      shipped trio's 4-20).  Warm start: shipped _s0 encoder+unitary_proj
#      transplant (head is L-shaped, re-learned in band 0).
#   B. Capacity probe: n_layers=12 at the sigma<=0.2 bands, same 16k
#      recipe/budget, warm start from the shipped _s0 (encoder_0..7 +
#      unitary_proj + head transplant; encoder_8..11 at init).
#   C. 5-point KAK-tail GRAPE ceilings at sigma=0.2 (p1/p5/p25/p50 join
#      the round-4 p10 row) + per-channel decomposition of the worst decile.
#
# Every stage runs under scripts/tpu_supervisor.sh (warm-sentinel +
# log-growth watchdog + restart; training stages checkpoint resume state
# every 25 epochs and pass --resume so restarts are cheap).
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

# ---------- A. L=100 chain ----------
log "START tql100_b0"
bash $SUP tql100_b0 240 900 8 -- python -u -m universal_quantum_optimal_control_tpu.workloads.two_qubit \
  $COMMON --max_pulses 100 --curriculum "0" --num_epoch 300 --monte_carlo 256 \
  --pretrained_single_qubit $W/two_qubit_d2_kak_s0.npz --transfer_also unitary_proj \
  --save_path runs/tql100_b0
log "END tql100_b0 rc=$?"

log "START tql100_b2"
bash $SUP tql100_b2 240 900 8 -- python -u -m universal_quantum_optimal_control_tpu.workloads.two_qubit \
  $COMMON --max_pulses 100 --curriculum "0.2" --num_epoch 250 --monte_carlo 1024 \
  --restore runs/tql100_b0:band0_delta0_eps0.05 \
  --save_path runs/tql100_b2
log "END tql100_b2 rc=$?"

log "START tql100_b4"
bash $SUP tql100_b4 240 900 8 -- python -u -m universal_quantum_optimal_control_tpu.workloads.two_qubit \
  $COMMON --max_pulses 100 --curriculum "0.4" --num_epoch 250 --monte_carlo 1024 \
  --restore runs/tql100_b2:band0_delta0.2_eps0.05 \
  --save_path runs/tql100_b4
log "END tql100_b4 rc=$?"

# ---------- B. 12-layer capacity probe ----------
log "START tq12L_b0"
bash $SUP tq12L_b0 240 900 8 -- python -u -m universal_quantum_optimal_control_tpu.workloads.two_qubit \
  $COMMON --n_layers 12 --max_pulses 40 --curriculum "0" --num_epoch 300 --monte_carlo 256 \
  --pretrained_single_qubit $W/two_qubit_d2_kak_s0.npz --transfer_also unitary_proj,head \
  --save_path runs/tq12L_b0
log "END tq12L_b0 rc=$?"

log "START tq12L_b2"
bash $SUP tq12L_b2 240 900 8 -- python -u -m universal_quantum_optimal_control_tpu.workloads.two_qubit \
  $COMMON --n_layers 12 --max_pulses 40 --curriculum "0.2" --num_epoch 250 --monte_carlo 1024 \
  --restore runs/tq12L_b0:band0_delta0_eps0.05 \
  --save_path runs/tq12L_b2
log "END tq12L_b2 rc=$?"

# ---------- C. sigma=0.2 KAK-tail ceilings (5-point) ----------
log "START dump02"
bash $SUP dump02 240 900 5 -- python -u -m universal_quantum_optimal_control_tpu.analysis.two_qubit_split_eval \
  $W/two_qubit_d2_kak.npz --sigma 0.2 --drive2 --kak_tokens --omega_min 0.05 \
  --dump_kak_percentiles 1,5,25,50 --dump_dir runs/kak_targets \
  --per_target_csv runs/flagship_per_target_s02.csv --channels_worst_decile
log "END dump02 rc=$?"

for tgt in runs/kak_targets/kak_p*.npz; do
  base=$(basename "$tgt" .npz)
  for nb in 10 20; do
    log "START ceil_${base}_b${nb}"
    bash $SUP "ceil_${base}_b${nb}" 240 1200 5 -- python -u -m universal_quantum_optimal_control_tpu.workloads.two_qubit_grape \
      --target_npz "$tgt" --drive2 --sigmas 0.05,0.1,0.15,0.2 \
      --n_blocks $nb --steps 3000 --n_starts 24 \
      --curve_sigmas 0.2 --curve_mc 8192 --out "runs/ceiling02/${base}_b${nb}"
    log "END ceil_${base}_b${nb} rc=$?"
  done
done

log "ALL DONE"
