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
echo $$ > /tmp/queue8.pid
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
