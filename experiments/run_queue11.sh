#!/bin/bash
# Eleventh-stage queue (round 4): re-run what queue10 could not finish —
#  1. the ViT-B@320 at-shape proof (now that the qkv attention backward no
#     longer bursts the 16 MB scoped-VMEM stack at npad=408, ops/attention.py)
#  2. a vmem pre-check of exactly that kernel at shape (fails fast if not)
#  3. the ConvNeXt-L@320 at-shape proof (queue10 died to a TPU worker crash
#     mid-FAB-T; re-run to see if it reproduces — if it does, the no-pallas
#     control in job 5 isolates whether a Pallas kernel faults at shape)
#  4. the t224 per-op refresh (queue10 job-1 hit the mixed-session xplane
#     bug, fixed in profile_step.py) and a vit_s refresh on the qkv kernel.
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

# 1. fail-fast vmem check of the fixed qkv attention bwd at the ViT-B@320 shape
run 1800 python experiments/attn_vmem_check.py

# 2. ViT-B@320 at-shape full-AA proof (cold-compile-sized timeout, CLAUDE.md)
run 10800 python experiments/aa_at_shape.py --arch vit_b --img_size 320

# 3. ConvNeXt-L@320 re-run (queue10: TPU worker crash mid-FAB-T)
run 10800 python experiments/aa_at_shape.py --arch convnext_large --img_size 320

# 4. per-op refreshes (bench config = no remat; vit_s now on the qkv kernel)
run 2400 python experiments/profile_step.py t224 --no-remat
run 2400 python experiments/profile_step.py vit_s --no-remat

# 5. bench.py end-to-end: exercises the compact-contract-line output fix
#    (BENCH_r03 "parsed": null) and refreshes the headline number
run 3600 python bench.py

echo "[queue11] done $(date -u +%T)" | tee -a "$LOG"
