#!/bin/bash
# Second-stage unattended queue: waits for the first run_queue.sh watcher
# (pid in /tmp/queue.pid) to finish, so two TPU processes never contend
# (CLAUDE.md), then runs the ViT-family end-to-end robustness proof.
#
#   nohup bash experiments/run_queue2.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue2.log}
mkdir -p experiments/artifacts
echo $$ > /tmp/queue2.pid  # run_queue3.sh serializes on this pidfile

PIDFILE=/tmp/queue.pid
if [ -f "$PIDFILE" ]; then
  PID=$(cat "$PIDFILE")
  while kill -0 "$PID" 2>/dev/null; do
    echo "[queue2] waiting on run_queue.sh pid=$PID $(date -u +%T)" | tee -a "$LOG"
    sleep 300
  done
else
  # no pidfile (run_queue.sh not launched, or an old launch that predates
  # the pidfile): fall back to its "done" log sentinel, any queue*.log
  until grep -qs "^\[queue\] done" experiments/artifacts/queue*.log; do
    echo "[queue2] waiting on run_queue.sh sentinel $(date -u +%T)" | tee -a "$LOG"
    sleep 300
  done
fi

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue2] tunnel down $(date -u +%T), retry in 10 min" | tee -a "$LOG"
  sleep 600
done
echo "[queue2] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout 4000 "$@" >>"$LOG" 2>&1
  echo "[queue2] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

# ViT-family twin of the end-to-end robustness proof (RESULTS_mini_vit_s.json)
run python experiments/mini_robustness.py all vit_s

echo "[queue2] done $(date -u +%T)" | tee -a "$LOG"
