#!/bin/bash
# Sixteenth-stage queue (round 4): FRESH wide_tail=OFF controls for
# b224/l224. The queue13 "A/B" compared a fresh wide_tail=ON arm against
# the ROUND-3 control rows (b224 409.7 ms / l224 765.5 ms, measured under
# different tunnel/host conditions); the fresh round-4 b224_fullrecipe
# pair (OFF 342.6 vs ON 344.0, aug ~ +39 ms over plain AT) implies the
# current plain-AT OFF arm is ~303 ms, i.e. wide_tail may be NEUTRAL on B
# in round-4 code. These two exclusive runs settle the A/B with both arms
# fresh; if OFF ~= ON, flip the factory auto default back to OFF.
# Serialized behind queue14/15 by the flock; safe to relaunch.
#
#   nohup bash experiments/run_queue16.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue16.log}
mkdir -p experiments/artifacts

exec 9>/tmp/tpu_queue.lock
flock 9

SELF=/tmp/queue16.pid
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
trap 'rm -f /tmp/queue16.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue16] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue16] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue16] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

run 3600 python experiments/big_model_bench.py b224
run 4800 python experiments/big_model_bench.py l224

echo "[queue16] done $(date -u +%T)" | tee -a "$LOG"
