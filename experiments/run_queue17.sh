#!/bin/bash
# Seventeenth-stage queue (round 5): finish the VERDICT-r4 measurement
# worklist items #1.
#   1. s224  — ConvNeXt-S-CvSt @224 AT row (queue15's s224 was killed by a
#      1500s timeout mid cold-compile; ADVICE r4 #1 says size for ~40min).
#   2. b224  — FRESH wide_tail=OFF plain-AT control (queue13's OFF row was
#      round-3 code; settles the factory auto default for convnext_base).
#   3. l224  — FRESH wide_tail=OFF plain-AT control (same, for large).
# Serialized behind any live queue by the flock; safe to relaunch.
#
# NOTE (ADVICE r4 #3): the flock is held for the whole queue life, so the
# queue can outlast bench.py's 2700s exclusive-wait window if jobs wedge
# back-to-back. This queue is launched at round START so it finishes hours
# before the driver's end-of-round bench; do NOT launch it late in a round.
#
#   nohup bash experiments/run_queue17.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue17.log}
mkdir -p experiments/artifacts

exec 9>/tmp/tpu_queue.lock
flock 9

SELF=/tmp/queue17.pid
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
trap 'rm -f /tmp/queue17.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue17] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue17] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue17] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

# cold compiles at never-compiled widths can take ~20-40 min (iso224's was
# 305s AFTER a 25-min s224 compile warmed shared subcomputations; b/l have
# cache entries only for the wide_tail=ON variant under round-4 code)
run 3600 python experiments/big_model_bench.py s224
run 3600 python experiments/big_model_bench.py b224
run 4800 python experiments/big_model_bench.py l224

echo "[queue17] done $(date -u +%T)" | tee -a "$LOG"
