#!/usr/bin/env bash
# Round-5 evaluation pass for the L=100 chain (and 12L probe when present):
# held-out 512-target split eval per band + named-gate tables.  Supervised
# (same warm/stall policy as the training queue).
set -u
cd "$(dirname "$0")/.."
SUP=scripts/tpu_supervisor.sh
log() { echo "=== $(date +%H:%M:%S) $*" >> runs/round5.log; }

EVCOMMON="--drive2 --kak_tokens --omega_min 0.05 --monte_carlo 2048"

if [ -d runs/tql100_b0 ]; then
  log "START eval tql100"
  bash $SUP ev_l100_b0 360 900 8 -- python -u -m universal_quantum_optimal_control_tpu.analysis.two_qubit_split_eval \
    runs/tql100_b0:band0_delta0_eps0.05 --sigma 0 $EVCOMMON --max_pulses 100
  bash $SUP ev_l100_b2 360 900 8 -- python -u -m universal_quantum_optimal_control_tpu.analysis.two_qubit_split_eval \
    runs/tql100_b2:band0_delta0.2_eps0.05 --sigma 0.2 $EVCOMMON --max_pulses 100 \
    --per_target_csv runs/l100_per_target_s02.csv
  bash $SUP ev_l100_b4 360 900 8 -- python -u -m universal_quantum_optimal_control_tpu.analysis.two_qubit_split_eval \
    runs/tql100_b4:band0_delta0.4_eps0.05 --sigma 0.4 $EVCOMMON --max_pulses 100
  # named gates (M=20000, best-of-Z4): the serving-relevant readout
  bash $SUP gates_l100_b2 360 1200 8 -- python -u -m universal_quantum_optimal_control_tpu.workloads.two_qubit_eval \
    --checkpoint runs/tql100_b2:band0_delta0.2_eps0.05 --max_pulses 100 \
    --sigmas 0,0.1,0.2,0.3 --out runs/gates_l100_b2.md
  bash $SUP gates_l100_b4 360 1200 8 -- python -u -m universal_quantum_optimal_control_tpu.workloads.two_qubit_eval \
    --checkpoint runs/tql100_b4:band0_delta0.4_eps0.05 --max_pulses 100 \
    --sigmas 0.35,0.4,0.5 --out runs/gates_l100_b4.md
  bash $SUP gates_l100_b0 360 1200 8 -- python -u -m universal_quantum_optimal_control_tpu.workloads.two_qubit_eval \
    --checkpoint runs/tql100_b0:band0_delta0_eps0.05 --max_pulses 100 \
    --sigmas 0,0.05 --out runs/gates_l100_b0.md
  log "END eval tql100"
fi

if [ -d runs/tq12L_b2 ]; then
  log "START eval tq12L"
  bash $SUP ev_12L_b2 360 900 8 -- python -u -m universal_quantum_optimal_control_tpu.analysis.two_qubit_split_eval \
    runs/tq12L_b2:band0_delta0.2_eps0.05 --sigma 0.2 $EVCOMMON --n_layers 12 \
    --per_target_csv runs/tq12L_per_target_s02.csv
  bash $SUP ev_12L_b0 360 900 8 -- python -u -m universal_quantum_optimal_control_tpu.analysis.two_qubit_split_eval \
    runs/tq12L_b0:band0_delta0_eps0.05 --sigma 0 $EVCOMMON --n_layers 12
  bash $SUP gates_12L_b2 360 1200 8 -- python -u -m universal_quantum_optimal_control_tpu.workloads.two_qubit_eval \
    --checkpoint runs/tq12L_b2:band0_delta0.2_eps0.05 --n_layers 12 \
    --sigmas 0,0.1,0.2,0.3 --out runs/gates_12L_b2.md
  log "END eval tq12L"
fi
