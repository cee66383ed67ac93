#!/bin/bash
# Eighth-stage queue: the last queue5 leftover — per-op xprof refresh of
# the ViT-S AT step (post vit_mlp_tail). Wrapped as a run_queue script so
# bench.py's wait_for_exclusive() recognizes the pidfile, even for a
# single job.
#
#   nohup bash experiments/run_queue8.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue8.log}
mkdir -p experiments/artifacts

# wait for ANY other live queue to finish before touching the chip
# (ONE process may use the TPU at a time; stale pidfiles are reaped)
SELF=/tmp/queue8.pid
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
trap 'rm -f /tmp/queue8.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue8] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue8] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue8] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

run 800 python experiments/profile_step.py vit_s --no-remat

echo "[queue8] done $(date -u +%T)" | tee -a "$LOG"
