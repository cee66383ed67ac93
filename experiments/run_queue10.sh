#!/bin/bash
# Tenth-stage queue (round 4): re-run of the at-shape proofs after the
# params-as-jit-arguments fix (the L@320 full-AA program previously burst
# the tunnel's remote-compile cap with ~800 MB of inlined closure params —
# HTTP 413, see evals/autoattack.py), plus the t224 per-op refresh at the
# bench configuration (no remat; the queue9 run profiled the remat build).
#
#   nohup bash experiments/run_queue10.sh [logfile] &
set -u
cd "$(dirname "$0")/.."
LOG=${1:-experiments/artifacts/queue10.log}
mkdir -p experiments/artifacts

SELF=/tmp/queue10.pid
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
trap 'rm -f /tmp/queue10.pid' EXIT

probe() { timeout 120 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
until probe; do
  echo "[queue10] tunnel down $(date -u +%T), retry in 5 min" | tee -a "$LOG"
  sleep 300
done
echo "[queue10] tunnel UP $(date -u +%T)" | tee -a "$LOG"

run() {
  local tmo=$1; shift
  echo "=== $* ($(date -u +%T)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  echo "[queue10] exit=$? $(date -u +%T)" | tee -a "$LOG"
}

# 1. t224 per-op refresh at the bench config (queue9 profiled the remat build)
run 1500 python experiments/profile_step.py t224 --no-remat

# 2. short perf A/Bs first — their results gate default-flag decisions the
#    builder acts on while the long at-shape jobs run afterwards
run 2400 python experiments/big_model_bench.py vit_s --no-remat --attn-impl bhnd
run 2400 python experiments/big_model_bench.py vit_s --no-remat
run 3600 python experiments/stem_conv_bench.py
run 2400 python experiments/big_model_bench.py t224 --no-remat
run 2400 python experiments/big_model_bench.py t224 --no-remat --stem-s2d

# 3. at-shape full-AA proofs (cold-compile-sized timeouts, CLAUDE.md)
run 10800 python experiments/aa_at_shape.py --arch convnext_large --img_size 320
run 9000 python experiments/aa_at_shape.py --arch vit_b --img_size 320

echo "[queue10] done $(date -u +%T)" | tee -a "$LOG"
