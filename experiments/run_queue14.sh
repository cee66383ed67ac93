#!/bin/bash
# Fourteenth-stage queue (round 4): retest the FAB-T @320 worker crash
# with the chunked-dispatch AutoAttack driver.
#
# queue13 established the crash is NOT a contention artifact: exclusive
# flock-serialized runs of aa_at_shape at 320px killed the TPU worker in
# FAB-T on BOTH convnext_large and vit_b, while APGD (whose driver
# dispatches ~1-minute per-target programs) passed at the same shape.
# Diagnosis: FAB-T held 9 targets x 100 iters (~900 model evals, ~8 min
# at L@320 bs64) in ONE device program; Square would have held 5000.
# Fix: carry-resumable chunked dispatch (evals/autoattack.py
# fab_iter_chunk/square_query_chunk) — trajectories bit-identical
# (tests/test_dispatch_chunking.py). These two jobs are the on-chip
# validation of that fix; with them, BASELINE config #5 (full AA on
# ConvNeXt-L-CvSt @320) is exercised end-to-end at shape.
#
#   nohup bash experiments/run_queue14.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue14.log}
mkdir -p experiments/artifacts

exec 9>/tmp/tpu_queue.lock
flock 9

SELF=/tmp/queue14.pid
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
trap 'rm -f /tmp/queue14.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue14] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue14] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue14] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

# at-shape full-AA proofs with chunked dispatch (APGD programs replay from
# the persistent cache; FAB/Square chunk programs are fresh compiles).
# Timeouts sized for cold compiles per CLAUDE.md.
run 10800 python experiments/aa_at_shape.py --arch convnext_large --img_size 320
run 9000 python experiments/aa_at_shape.py --arch vit_b --img_size 320

# BASELINE config #4 row refresh: queue13 measured the full-recipe B step
# with wide_tail OFF (342.6 ms); the factory default is now auto=ON for
# convnext_base — re-measure the recipe row with the shipped default.
run 3600 python experiments/big_model_bench.py b224_fullrecipe --wide-tail

echo "[queue14] done $(date -u +%T)" | tee -a "$LOG"
