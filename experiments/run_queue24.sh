#!/bin/bash
# Twenty-fourth-stage queue (round 5): decoded-image cache A/B on the
# real folder pipeline at 224 (data.in_memory now caches decoded images
# across epochs for sets under the 4 GB budget — the 1-core host was
# decode-bound at 20-40 s/epoch in the 224px mini runs). Two short
# 10-epoch digit trains, identical but for --data.in_memory.
# Serialized behind earlier queues + the pytest pidfile; safe to relaunch.
#
#   nohup bash experiments/run_queue24.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue24.log}
mkdir -p experiments/artifacts

exec 9>/tmp/tpu_queue.lock
flock 9

SELF=/tmp/queue24.pid
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
trap 'rm -f /tmp/queue24.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue24] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue24] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue24] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

MINI="python -m revisiting_at_tpu.cli.train --model.arch convnext_tiny \
 --model.not_original 1 --model.model_ema 1 --data.dataset folder \
 --data.train_dataset runs/digits_data/train --data.val_dataset runs/digits_data/val \
 --data.num_classes 10 --data.augmentations 0 --resolution.min_res 224 \
 --resolution.max_res 224 --validation.resolution 224 --validation.batch_size 80 \
 --training.batch_size 80 --training.epochs 10 --lr.lr 1e-3 --lr.lr_peak_epoch 1 \
 --logging.save_freq 50"
run 2400 bash -c "$MINI --data.in_memory 0 --logging.folder runs/cacheab_off"
run 2400 bash -c "$MINI --data.in_memory 1 --logging.folder runs/cacheab_on"

echo "[queue24] done $(date -u +%T)" | tee -a "$LOG"
