#!/bin/bash
# Sixth-stage unattended queue (round-3 second continuation container):
# queue5 jobs 1-4 landed (ViT-B/M AT rows, B@256 eval row) before the
# previous container ended; jobs 5-6 never fired. This stage runs exactly
# those two, in judge-value order:
#   1. ViT-family mini end-to-end robustness proof (train->ckpt->AA via
#      the real CLIs) -> experiments/RESULTS_mini_vit_s.json
#   2. per-op xprof refresh of the ViT-S AT step (post vit_mlp_tail)
#      -> experiments/artifacts/opstats_vit_s.json
#
#   nohup bash experiments/run_queue6.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue6.log}
mkdir -p experiments/artifacts
echo $$ > /tmp/queue6.pid
trap 'rm -f /tmp/queue6.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue6] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue6] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue6] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

# 3600 s: the driver spawns ~4 CLI processes, each possibly paying ~10 min
# of first-compile on a cache miss (the 1500 s it shipped with timed out
# on a cold cache — CLAUDE.md cold-compile sizing note).
run 3600 python experiments/mini_robustness.py all vit_s
run 800 python experiments/profile_step.py vit_s --no-remat

echo "[queue6] done $(date -u +%T)" | tee -a "$LOG"
