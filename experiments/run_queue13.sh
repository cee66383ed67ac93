#!/bin/bash
# Thirteenth-stage queue (round 4): CLEAN re-measurement after the
# double-watcher incident. Two stale queue11 watchers (one surviving a
# container restart) plus a stale queue12 watcher ran every queue11 job
# TWICE, interleaved — so the 05:24-06:10 numbers (vit_b/vit_m qkv rows,
# vit_s per-op refresh) were measured under TPU contention, and the
# "TPU worker crashed" FAB-T failures at 320px are plausibly contention
# artifacts, not kernel bugs. This queue re-runs everything exclusively,
# serialized by flock (which also prevents any recurrence: bench.py and
# all queue12+ scripts take the same lock).
#
# Priority order: cheap control rows first, then A/Bs, then the long
# at-shape proofs — so an early container stop still lands the refresh.
#
#   nohup bash experiments/run_queue13.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue13.log}
mkdir -p experiments/artifacts

exec 9>/tmp/tpu_queue.lock
flock 9

SELF=/tmp/queue13.pid
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
trap 'rm -f /tmp/queue13.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue13] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue13] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue13] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

# 1. clean control rows: ViT-B/M with the default qkv attention kernel
#    (replaces the contention-tainted 231.3/136.8 ms rows)
run 3600 python experiments/big_model_bench.py vit_b --no-remat
run 2400 python experiments/big_model_bench.py vit_m --no-remat

# 2. wide_tail A/Bs against those controls + the ConvNeXt remat rows
run 3600 python experiments/big_model_bench.py vit_b --no-remat --wide-tail
run 3600 python experiments/big_model_bench.py b224 --wide-tail
run 4800 python experiments/big_model_bench.py l224 --wide-tail

# 3. BASELINE.json config #4 verbatim: full recipe on ConvNeXt-B-CvSt
run 4800 python experiments/big_model_bench.py b224_fullrecipe

# 4. ViT-S per-op refresh with qkv attention
run 1800 python experiments/profile_step.py vit_s --no-remat

# 5-6. at-shape full-AA proofs, now EXCLUSIVE: retests whether the FAB-T
#      "worker crashed" failures were contention artifacts
run 10800 python experiments/aa_at_shape.py --arch convnext_large --img_size 320
run 9000 python experiments/aa_at_shape.py --arch vit_b --img_size 320

echo "[queue13] done $(date -u +%T)" | tee -a "$LOG"
