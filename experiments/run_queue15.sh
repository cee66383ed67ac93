#!/bin/bash
# Fifteenth-stage queue (round 4): complete the README headline-table arch
# coverage in RESULTS_big — ConvNeXt-S-CvSt (README.md:38) and
# ConvNeXt-iso-CvSt (README.md:32) AT rows @224 bs80, the two paper-table
# archs with no on-chip step measurement yet. Serialized behind queue14 by
# the flock; safe to relaunch (pidfile wait + flock).
#
#   nohup bash experiments/run_queue15.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue15.log}
mkdir -p experiments/artifacts

exec 9>/tmp/tpu_queue.lock
flock 9

SELF=/tmp/queue15.pid
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
trap 'rm -f /tmp/queue15.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue15] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue15] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue15] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

# fresh compiles at new widths: size timeouts for cold compiles
run 1500 python experiments/big_model_bench.py s224
run 1500 python experiments/big_model_bench.py iso224

echo "[queue15] done $(date -u +%T)" | tee -a "$LOG"
