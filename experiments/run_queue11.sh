#!/bin/bash
# Eleventh-stage queue (round 4): re-runs of the three queue10 failures,
# all now unblocked by committed fixes, plus a ViT-B/M row refresh so the
# big-model table reflects the new default qkv attention kernel:
#   1. profile_step t224 --no-remat  (queue10 fail: mixed xprof sessions;
#      fixed by the unique-trace-dir change, a2eb765)
#   2. big_model_bench vit_b / vit_m --no-remat (rows predate attn v2)
#   3. aa_at_shape convnext_large@320 (queue10 fail: TPU worker crash in
#      FAB-T — retry; APGD-CE/T had already passed at shape)
#   4. aa_at_shape vit_b@320 (queue10 fail: qkv-bwd scoped-VMEM overflow
#      at 401 tokens; fixed by 8348c3f)
#
#   nohup bash experiments/run_queue11.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue11.log}
mkdir -p experiments/artifacts

SELF=/tmp/queue11.pid
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
trap 'rm -f /tmp/queue11.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue11] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue11] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue11] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

# 1. per-op refresh of the headline bench config (fresh trace dir each run)
run 1500 python experiments/profile_step.py t224 --no-remat

# 2. ViT-B/M AT rows with the now-default qkv attention kernel
run 3600 python experiments/big_model_bench.py vit_b --no-remat
run 2400 python experiments/big_model_bench.py vit_m --no-remat

# 3-4. at-shape full-AA proofs (cold-compile-sized timeouts, CLAUDE.md)
run 10800 python experiments/aa_at_shape.py --arch convnext_large --img_size 320
run 9000 python experiments/aa_at_shape.py --arch vit_b --img_size 320

echo "[queue11] done $(date -u +%T)" | tee -a "$LOG"
