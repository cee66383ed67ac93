#!/bin/bash
# Eighteenth-stage queue (round 5): kernel A/Bs that only became meaningful
# this round.
#   1-2. split_bwd A/B (VERDICT r4 item#5): two-kernel full backward on the
#        headline archs; controls are the fresh t224 (124.8 ms) and vit_s
#        (103.0 ms) rows.
#   3-4. REAL wide_tail ON rows for b224/l224: round 5 found the knob was
#        never forwarded to hierarchical-ConvNeXt blocks, so the r4 "ON"
#        rows measured the OFF program — these are the first true wide-tail
#        compiles at C=768/1024 (fresh OFF controls land via queue17).
# Serialized behind queue17/verify_r5 by the flock; safe to relaunch.
#
#   nohup bash experiments/run_queue18.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue18.log}
mkdir -p experiments/artifacts

exec 9>/tmp/tpu_queue.lock
flock 9

SELF=/tmp/queue18.pid
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
trap 'rm -f /tmp/queue18.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue18] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue18] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue18] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

# all are never-compiled programs: size timeouts for cold compiles.
# t224/vit_s run --no-remat to MATCH the fresh controls (the headline
# bench config is remat-free: verify_r5 bench measured t224 123.1 /
# vit_s 102.6 ms same-session; the remat=true t224 split row 144.0 ms
# already landed and its only control is the stale r3 145.6).
run 2400 python experiments/big_model_bench.py t224 --split-bwd --no-remat
run 2400 python experiments/big_model_bench.py vit_s --split-bwd --no-remat
run 3600 python experiments/big_model_bench.py b224 --wide-tail
run 4800 python experiments/big_model_bench.py l224 --wide-tail

echo "[queue18] done $(date -u +%T)" | tee -a "$LOG"
