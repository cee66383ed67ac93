#!/bin/bash
# Nineteenth-stage queue (round 5): mini-robustness arms for VERDICT r4
# missing #2/#3/#4 — each through the REAL train+eval CLIs on the chip.
#   1. fgsm   — single-step RS-FGSM AT (BASELINE config #2); expect robust
#               acc between clean-trained (~5%) and APGD-AT (~99%).
#   2. l2     — L2-APGD adversarial TRAINING (the one untraveled train
#               path) + Linf/L2 cross-norm eval table.
#   3. res224 — clean + AT twins at the PRODUCTION resolution (224, bs80,
#               RandAugment+mixup), upscaled digits, AutoAttack at 224.
# Serialized behind queue17/18/verify_r5 by the flock; safe to relaunch.
#
#   nohup bash experiments/run_queue19.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue19.log}
mkdir -p experiments/artifacts

exec 9>/tmp/tpu_queue.lock
flock 9

SELF=/tmp/queue19.pid
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
trap 'rm -f /tmp/queue19.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue19] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue19] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue19] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

# each stage spawns several CLI processes, each possibly paying cold
# compiles (CLAUDE.md: size queue timeouts for COLD compiles)
run 3600 python experiments/mini_robustness.py fgsm
run 5400 python experiments/mini_robustness.py l2
run 7200 python experiments/mini_robustness.py res224

echo "[queue19] done $(date -u +%T)" | tee -a "$LOG"
