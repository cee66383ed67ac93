#!/bin/bash
# Twenty-third-stage queue (round 5): L1-APGD adversarial-training arm —
# completes the three-norm training matrix (Linf r2, L2 + FGSM this
# round); trains at the r3 cross-norm eval point (L1 eps 6.0 at 64px)
# and evaluates Linf+L1.
# Serialized behind earlier queues + the pytest pidfile; safe to relaunch.
#
#   nohup bash experiments/run_queue23.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue23.log}
mkdir -p experiments/artifacts

exec 9>/tmp/tpu_queue.lock
flock 9

SELF=/tmp/queue23.pid
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
trap 'rm -f /tmp/queue23.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue23] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue23] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue23] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

run 5400 python experiments/mini_robustness.py l1
# per-op truth at shipped defaults (t224 headline + vit_s qkv)



echo "[queue23] done $(date -u +%T)" | tee -a "$LOG"
