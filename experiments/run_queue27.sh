#!/bin/bash
# Twenty-seventh-stage queue (round 5): ViT-family round-5 arms — L1-AT
# and L2-AT of ViT-S-CvSt through the full CLIs (the ConvNeXt-family
# arms landed via queue19/20/23; this extends the family x threat-model
# evidence matrix to the second headline family).
# Serialized behind earlier queues + the pytest pidfile; safe to relaunch.
#
#   nohup bash experiments/run_queue27.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue27.log}
mkdir -p experiments/artifacts

exec 9>/tmp/tpu_queue.lock
flock 9

SELF=/tmp/queue27.pid
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
trap 'rm -f /tmp/queue27.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue27] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue27] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue27] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

run 5400 python experiments/mini_robustness.py l1 vit_s


echo "[queue27] done $(date -u +%T)" | tee -a "$LOG"
