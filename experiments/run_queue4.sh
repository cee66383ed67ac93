#!/bin/bash
# Fourth-stage unattended queue: fresh per-op truth for the headline
# ConvNeXt-T configs (post gamma-fold + augment-warp fixes) — bounds the
# remaining ~20 ms "elementwise/reductions" group (PROFILE.md per-op table)
# with xprof data, feeding the round-4 decision on a fused APGD-update
# kernel. Serializes on all earlier queue stages (ONE process may use the
# TPU at a time, CLAUDE.md).
#
#   nohup bash experiments/run_queue4.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue4.log}
mkdir -p experiments/artifacts
echo $$ > /tmp/queue4.pid

for PF in /tmp/queue.pid /tmp/queue2.pid /tmp/queue3.pid; do
  if [ -f "$PF" ]; then
    PID=$(cat "$PF")
    while kill -0 "$PID" 2>/dev/null; do
      echo "[queue4] waiting on pid $PID ($PF) $(date -u +%T)" | tee -a "$LOG"
      sleep 300
    done
  fi
done
until grep -qs "^\[queue3\] done" experiments/artifacts/queue*.log; do
  echo "[queue4] waiting on run_queue3.sh sentinel $(date -u +%T)" | tee -a "$LOG"
  sleep 300
done

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue4] tunnel down $(date -u +%T), retry in 10 min" | tee -a "$LOG"
  sleep 600
done
echo "[queue4] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout 3000 "$@" >>"$LOG" 2>&1
  echo "[queue4] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

# per-op tables: headline AT step + full-recipe step (both bs80, no remat)
run python experiments/profile_step.py t224 --no-remat
run python experiments/profile_step.py t224_fullrecipe --no-remat

echo "[queue4] done $(date -u +%T)" | tee -a "$LOG"
