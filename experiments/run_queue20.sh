#!/bin/bash
# Twentieth-stage queue (round 5): retry the fgsm mini arm (its first run
# wedged at epoch 111/150 on a tunnel flake — main thread futex-wait, one
# thread ep_poll, while a FRESH probe process saw the tunnel up; killed by
# PID) and the deferred per-op xprof refresh at shipped defaults
# (VERDICT r4 item#9, queue8 descendant).
# Serialized behind queue19 by the flock; safe to relaunch.
#
#   nohup bash experiments/run_queue20.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue20.log}
mkdir -p experiments/artifacts

exec 9>/tmp/tpu_queue.lock
flock 9

SELF=/tmp/queue20.pid
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
trap 'rm -f /tmp/queue20.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue20] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue20] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue20] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

run 3600 python experiments/mini_robustness.py fgsm
# per-op truth at shipped defaults (t224 headline + vit_s qkv)
run 2400 python experiments/profile_step.py t224 --no-remat
run 2400 python experiments/profile_step.py vit_s --no-remat

echo "[queue20] done $(date -u +%T)" | tee -a "$LOG"
