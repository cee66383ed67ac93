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

# wait for ANY other live queue to finish (generic glob — a hard-coded
# range like queue[0-6] cannot match later stages, e.g. queue8)
SELF=/tmp/queue7.pid
while :; do
  live=0
  for p in /tmp/queue*.pid; do
    [ -e "$p" ] || continue
    [ "$p" = "$SELF" ] && continue
    if kill -0 "$(cat "$p")" 2>/dev/null; then live=1; else rm -f "$p"; fi
  done
  [ "$live" = 0 ] && break
  sleep 30
done

echo $$ > "$SELF"
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
