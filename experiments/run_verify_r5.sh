#!/bin/bash
# Round-5 /verify drive (TPU surfaces), serialized behind the measurement
# queues by the flock. Surfaces per .claude/skills/verify/SKILL.md:
#   1. train CLI (synthetic, micro, apgd) — plus an FGSM variant (round-5
#      new path: real adv_acc metric in fgsm mode)
#   2. eval CLI on the apgd run, WITH --save_imgs (round-5 new path:
#      memmap .npy assembly)
#   3b. entry() driver contract on the real chip
#   4. bench.py (includes the new vit_s_fgsm_at regression row)
#
#   nohup bash experiments/run_verify_r5.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/verify_r5.log}
mkdir -p experiments/artifacts

exec 9>/tmp/tpu_queue.lock
flock 9

SELF=/tmp/queue_v5.pid
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
trap 'rm -f /tmp/queue_v5.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[verify_r5] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[verify_r5] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[verify_r5] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

rm -rf /tmp/verify_runs /tmp/verify_runs_fgsm

# 1. train CLI, the skill's recipe verbatim
run 1800 python -m revisiting_at_tpu.cli.train \
  --model.arch convnext_micro --model.not_original 1 --model.add_normalization 0 \
  --model.model_ema 1 --adv.attack apgd --adv.n_iter 2 \
  --data.dataset synthetic --data.num_classes 13 \
  --training.batch_size 16 --training.epochs 2 --training.precision fp32 \
  --resolution.min_res 32 --resolution.max_res 32 \
  --validation.batch_size 16 --validation.resolution 32 \
  --logging.folder /tmp/verify_runs

# 1b. FGSM train mode (round-5: real adv_acc; expect adv_acc < 1.0 in logs)
run 1800 python -m revisiting_at_tpu.cli.train \
  --model.arch convnext_micro --model.not_original 1 --model.add_normalization 0 \
  --model.model_ema 1 --adv.attack fgsm --adv.alpha 1.25 \
  --data.dataset synthetic --data.num_classes 13 \
  --training.batch_size 16 --training.epochs 2 --training.precision fp32 \
  --resolution.min_res 32 --resolution.max_res 32 \
  --validation.batch_size 16 --validation.resolution 32 \
  --logging.folder /tmp/verify_runs_fgsm

# 2. eval CLI on the apgd run, with --save_imgs (memmap assembly path)
run 1800 bash -c 'python -m revisiting_at_tpu.cli.eval --run_dir /tmp/verify_runs/model_* \
  --n_ex 32 --batch_size 16 --l_norms Linf --eps 0.1 --n_iter 10 --img_size 32 \
  --synthetic --save_imgs'

# 3b. entry() on the real chip
run 600 python -c "import jax, __graft_entry__ as g; fn,a=g.entry(); print(jax.jit(fn)(*a).shape)"

# 4. bench (headline + regression rows incl. the new fgsm row)
run 3600 python bench.py

echo "[verify_r5] done $(date -u +%T)" | tee -a "$LOG"
