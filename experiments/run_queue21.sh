#!/bin/bash
# Twenty-first-stage queue (round 5): res224 mini arm v2 — the aug=1 first
# run collapsed the AT arm to uniform logits (train_loss = ln(10); the
# known hard-AT regime on 1497 toy images); stage_res224 now runs the
# proven 64px protocol (augmentations=0) at 224.
# Serialized behind queue19/20 by the flock; safe to relaunch.
#
#   nohup bash experiments/run_queue21.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue21.log}
mkdir -p experiments/artifacts

exec 9>/tmp/tpu_queue.lock
flock 9

SELF=/tmp/queue21.pid
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
trap 'rm -f /tmp/queue21.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue21] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue21] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue21] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

run 7200 python experiments/mini_robustness.py res224
# per-op truth at shipped defaults (t224 headline + vit_s qkv)



echo "[queue21] done $(date -u +%T)" | tee -a "$LOG"
