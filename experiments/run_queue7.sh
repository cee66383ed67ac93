#!/bin/bash
# Seventh-stage unattended queue: the queue4 leftover — per-op xprof
# refresh of the ConvNeXt-T headline AT step (post gamma-fold, r3 code).
# Chained after queue6: waits for /tmp/queue6.pid to vanish before
# touching the chip (ONE process may use the TPU at a time).
#
#   nohup bash experiments/run_queue7.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue7.log}
mkdir -p experiments/artifacts

# wait for queue6 (and any other live queue) to finish
while ls /tmp/queue[0-6].pid >/dev/null 2>&1; do
  for p in /tmp/queue[0-6].pid; do
    [ -e "$p" ] || continue
    kill -0 "$(cat "$p")" 2>/dev/null || rm -f "$p"   # stale sentinel
  done
  sleep 30
done

echo $$ > /tmp/queue7.pid
trap 'rm -f /tmp/queue7.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue7] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue7] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue7] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

run 800 python experiments/profile_step.py t224

echo "[queue7] done $(date -u +%T)" | tee -a "$LOG"
