#!/bin/bash
# Third-stage unattended queue: BASELINE config #5 at shape — full
# AutoAttack protocol cost of ConvNeXt-L-CvSt @320 (reference README.md:45)
# and the ViT-B @320 twin (pos-embed interpolation + 401-token attacks),
# via experiments/aa_at_shape.py driving the REAL eval CLI.
#
# Waits for the earlier queues via their log sentinels (each always prints
# a final "done" line), so two TPU processes never contend (CLAUDE.md).
#
#   nohup bash experiments/run_queue3.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue3.log}
mkdir -p experiments/artifacts

# serialize on live pidfiles first (sentinel logs can be stale across
# rounds; run_queue.sh rotates them at launch, but a pidfile is authoritative)
for PF in /tmp/queue.pid /tmp/queue2.pid; do
  if [ -f "$PF" ]; then
    PID=$(cat "$PF")
    while kill -0 "$PID" 2>/dev/null; do
      echo "[queue3] waiting on pid $PID ($PF) $(date -u +%T)" | tee -a "$LOG"
      sleep 300
    done
  fi
done
until grep -qs "^\[queue\] done" experiments/artifacts/queue*.log; do
  echo "[queue3] waiting on run_queue.sh $(date -u +%T)" | tee -a "$LOG"
  sleep 300
done
until grep -qs "^\[queue2\] done" experiments/artifacts/queue*.log; do
  echo "[queue3] waiting on run_queue2.sh $(date -u +%T)" | tee -a "$LOG"
  sleep 300
done

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue3] tunnel down $(date -u +%T), retry in 10 min" | tee -a "$LOG"
  sleep 600
done
echo "[queue3] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "${TMO:-6000}" "$@" >>"$LOG" 2>&1
  echo "[queue3] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

# BASELINE config #5 at shape: full AA (APGD-CE/T, FAB-T, Square-5000)
# of ConvNeXt-L-CvSt @320, bs64 worklist, via the real eval CLI
TMO=7200 run python experiments/aa_at_shape.py --arch convnext_large --img_size 320
# ViT-B-CvSt @320: resize_vit_pos_embed + 401-token attack kernels at shape
TMO=5400 run python experiments/aa_at_shape.py --arch vit_b --img_size 320

echo "[queue3] done $(date -u +%T)" | tee -a "$LOG"
