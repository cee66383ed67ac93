#!/bin/bash
# Twelfth-stage queue (round 4): wide_tail A/Bs — the fused block-tail FULL
# backward past C=512 against the 64 MB scoped-VMEM cap (ops/block_mlp.py).
# Controls: queue11's vit_b refresh (qkv attention), RESULTS_big b224/l224
# remat rows. Plus the ViT-S per-op refresh with the now-default qkv kernel
# (the round-3 opstats_vit_s.json predates attention v2), and the literal
# BASELINE.json config #4 step (full recipe on ConvNeXt-B-CvSt).
#
#   nohup bash experiments/run_queue12.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue12.log}
mkdir -p experiments/artifacts

# Serialization (two layers):
# 1. flock — removes the waiting-watchers race: pidfiles are written only
#    AFTER the wait loop, so two queues launched while a third runs could
#    both pass the wait at the same poll and contend for the TPU. The lock
#    is held for this queue's whole job section; any number of flock-aware
#    queues can be launched at any time.
# 2. Legacy pidfile wait — queues that predate the lock (queue11) and
#    direct pytest runs (/tmp/pytest.pid) hold no flock; wait them out.
exec 9>/tmp/tpu_queue.lock
flock 9

SELF=/tmp/queue12.pid
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
trap 'rm -f /tmp/queue12.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue12] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue12] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue12] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

# 1. ViT-S per-op refresh with qkv attention (bench config, cold compile ok)
run 1800 python experiments/profile_step.py vit_s --no-remat

# 2. wide_tail A/Bs (controls already in RESULTS_big.json)
run 3600 python experiments/big_model_bench.py vit_b --no-remat --wide-tail
run 3600 python experiments/big_model_bench.py b224 --wide-tail
run 4800 python experiments/big_model_bench.py l224 --wide-tail

# 3. BASELINE.json config #4 verbatim: full recipe (uint8 -> on-device
#    RandAugment/erasing/hflip -> mixup/cutmix -> 2-step APGD -> update)
#    on ConvNeXt-B-CvSt @224 bs80 (cold-compile-sized timeout, CLAUDE.md)
run 4800 python experiments/big_model_bench.py b224_fullrecipe

echo "[queue12] done $(date -u +%T)" | tee -a "$LOG"
