#!/bin/bash
# Unattended TPU measurement queue (round-3 items blocked by the tunnel
# outage, NEXT.md): probes the tunnel, and once it answers runs the queued
# measurements serially — ONE process may use the TPU at a time (CLAUDE.md).
# Each item is bounded by a timeout and logged; a failed item does not block
# the rest (short processes survive tunnel flakes; the persistent compile
# cache makes re-runs cheap).
#
#   bash experiments/run_queue.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue.log}
mkdir -p experiments/artifacts
# rotate stale logs: later queue stages serialize on "done" sentinels in
# queue*.log, and a retained sentinel from a PAST round would let them race
# this one onto the chip (two contenders both hang — CLAUDE.md)
for f in experiments/artifacts/queue*.log; do
  [ -e "$f" ] && [ "$f" != "$LOG" ] && mv "$f" "$f.old"
done
[ -e "$LOG" ] && mv "$LOG" "$LOG.old"
echo $$ > /tmp/queue.pid   # run_queue2.sh serializes on this pidfile

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }

echo "[queue] probing tunnel $(date -u +%F' '%T)" | tee -a "$LOG"
until probe; do
  echo "[queue] tunnel down $(date -u +%T), retry in 10 min" | tee -a "$LOG"
  sleep 600
done
echo "[queue] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout 3000 "$@" >>"$LOG" 2>&1
  echo "[queue] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

# verify-skill TPU surfaces first (.claude/skills/verify/SKILL.md): train CLI
# -> eval CLI on that run -> driver entry(); micro model @32px, cached compiles
VDIR=/tmp/verify_runs_$(date -u +%s)
run python -m revisiting_at_tpu.cli.train \
  --model.arch convnext_micro --model.not_original 1 --model.add_normalization 0 \
  --model.model_ema 1 --adv.attack apgd --adv.n_iter 2 \
  --data.dataset synthetic --data.num_classes 13 \
  --training.batch_size 16 --training.epochs 2 --training.precision fp32 \
  --resolution.min_res 32 --resolution.max_res 32 \
  --validation.batch_size 16 --validation.resolution 32 \
  --logging.folder "$VDIR"
RUNDIR=$(ls -d "$VDIR"/model_* 2>/dev/null | head -1)
if [ -n "${RUNDIR:-}" ]; then
  run python -m revisiting_at_tpu.cli.eval --run_dir "$RUNDIR" \
    --n_ex 32 --batch_size 16 --l_norms Linf --eps 0.1 --n_iter 10 --img_size 32 \
    --synthetic
else
  echo "[queue] train CLI produced no run dir — eval surface skipped" | tee -a "$LOG"
fi
run python -c "import jax, __graft_entry__ as g; fn,a=g.entry(); print(jax.jit(fn)(*a).shape)"

# ViT-M fused-tail A/B (C=512 heavy tail at the 26 MB budget — gate coded
# round-3, measurement pending; PROFILE.md)
run python experiments/big_model_bench.py vit_m --no-remat
run python experiments/big_model_bench.py vit_m --no-remat --no-pallas
# ViT-B AT row (C=768: fused attention + input-mode tail only)
run python experiments/big_model_bench.py vit_b --no-remat
# ConvNeXt-B @256 eval forward (README.md:43 evaluates B at 256)
run python experiments/big_model_bench.py b256eval
# reproducible per-op profile of the fused ViT-S step (post MLP-tail)
run python experiments/profile_step.py vit_s --no-remat
# headline refresh
run python bench.py

echo "[queue] done $(date -u +%T)" | tee -a "$LOG"
