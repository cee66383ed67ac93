#!/bin/bash
# Twenty-sixth-stage queue (round 5): ViT-S at the production resolution —
# the res224 efficacy proof for the second headline family (ConvNeXt's
# landed via queue21).
# Serialized behind earlier queues + the pytest pidfile; safe to relaunch.
#
#   nohup bash experiments/run_queue26.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue26.log}
mkdir -p experiments/artifacts

exec 9>/tmp/tpu_queue.lock
flock 9

SELF=/tmp/queue26.pid
while :; do
  live=0
  for p in /tmp/queue*.pid /tmp/pytest.pid; do
    [ -e "$p" ] || continue
    [ "$p" = "$SELF" ] && continue
    if kill -0 "$(cat "$p")" 2>/dev/null; then live=1; else rm -f "$p"; fi
  done
  [ "$live" = 0 ] && break
  sleep 30
done

echo $$ > "$SELF"
trap 'rm -f /tmp/queue26.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue26] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue26] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue26] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

run 9000 python experiments/mini_robustness.py res224 vit_s

echo "[queue26] done $(date -u +%T)" | tee -a "$LOG"
