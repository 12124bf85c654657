#!/usr/bin/env bash
# Supervised execution of one TPU CLI run on the flaky axon tunnel.
#
#   tpu_supervisor.sh <name> <warm_timeout_s> <stall_timeout_s> <max_restarts> -- cmd...
#
# The axon tunnel's first device->host read is heavy-tailed: usually
# 30-60 s, sometimes wedged forever (the compute stream stays healthy while
# the first result fetch never returns).  Every supervised CLI prints a
# "device warm" sentinel once a scalar has round-tripped
# (utils/device_warmup.py).  Policy:
#   * no sentinel within warm_timeout  -> kill, restart (a fresh process
#     re-rolls the connection; observed to succeed within a few attempts)
#   * log stops growing for stall_timeout after warm -> SIGUSR1 (stack dump
#     into the log), kill, restart; training CLIs pass --state_every N
#     --resume so a restart continues from the last saved state
#   * exit rc=0 -> done
# Attempt logs: runs/<name>.a<K>.log; events: runs/supervisor.log.
set -u
name=$1 warm=$2 stall=$3 maxr=$4; shift 4
[ "${1:-}" = "--" ] && shift
mkdir -p runs
ev() { echo "$(date +%H:%M:%S) [$name] $*" >> runs/supervisor.log; }

for a in $(seq 0 "$maxr"); do
  log="runs/${name}.a${a}.log"
  : > "$log"
  "$@" > "$log" 2>&1 &
  pid=$!
  ev "attempt $a pid $pid"

  # phase 1: wait for the warm sentinel
  t=0 warm_ok=
  while kill -0 "$pid" 2>/dev/null && [ "$t" -lt "$warm" ]; do
    if grep -q "device warm" "$log" 2>/dev/null; then warm_ok=1; break; fi
    sleep 10; t=$((t + 10))
  done
  if kill -0 "$pid" 2>/dev/null && [ -z "$warm_ok" ]; then
    ev "no warm sentinel after ${warm}s - kill + retry"
    kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
    wait "$pid" 2>/dev/null
    sleep 15   # let the tunnel settle before re-rolling the connection
    continue
  fi

  # phase 2: log-growth watchdog until exit
  last=$(stat -c%s "$log" 2>/dev/null || echo 0); idle=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    cur=$(stat -c%s "$log" 2>/dev/null || echo 0)
    if [ "$cur" -eq "$last" ]; then idle=$((idle + 30)); else idle=0; last=$cur; fi
    if [ "$idle" -ge "$stall" ]; then
      ev "log idle ${stall}s - stack dump + kill + retry"
      kill -USR1 "$pid" 2>/dev/null; sleep 3
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid" 2>/dev/null; rc=$?
  ev "attempt $a exit rc=$rc"
  [ "$rc" -eq 0 ] && exit 0
done
ev "FAILED after $((maxr + 1)) attempts"
exit 1
