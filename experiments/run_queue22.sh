#!/bin/bash
# Twenty-second-stage queue (round 5): wide_tail on the SMALL hierarchical
# ConvNeXts — with the forwarding bug fixed, the knob can now fuse the
# 3 C=768 stage-3 block tails of T/S (the L win was 27 such blocks).
# Controls: t224 no-remat 123.1 (verify_r5 bench), s224 remat 210.9.
# Serialized behind earlier queues by the flock; safe to relaunch.
#
#   nohup bash experiments/run_queue22.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue22.log}
mkdir -p experiments/artifacts

exec 9>/tmp/tpu_queue.lock
flock 9

SELF=/tmp/queue22.pid
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
trap 'rm -f /tmp/queue22.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue22] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue22] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue22] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

run 2400 python experiments/big_model_bench.py t224 --wide-tail --no-remat
run 2400 python experiments/big_model_bench.py s224 --wide-tail
# per-op truth at shipped defaults (t224 headline + vit_s qkv)



echo "[queue22] done $(date -u +%T)" | tee -a "$LOG"
