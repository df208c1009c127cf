#!/bin/bash
# Round-4d TPU perf probes (VERDICT r3 item 1: cross the 3.0x line; at
# 104.22 img/s = 2.98x the gap is 0.8%).  Levers left after the r3/r4a
# campaigns (3B fusion is impossible: the EI branch input depends on the
# main branch OUTPUT in both forward and backward):
#   1. scan_steps (lax.scan multi-step dispatch): historically +0.7% — was
#      left off by default as marginal; re-measure at the flat-state head.
#   2. SEI_TRUNK_TCH re-sweep: the 4608 optimum was picked pre-flat-state.
# Interleaved control pairs; each leg re-measured twice.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
EV=experiments/evidence
LOG=$EV/bench_probe_r4d.log

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

run() {  # run <label> <env...>
  local LABEL=$1; shift
  echo "--- $LABEL" | tee -a "$LOG"
  env "$@" timeout 900 python bench.py 2>&1 | grep -v WARN | tail -1 | tee -a "$LOG"
}

: > "$LOG"
for REP in 1 2; do
  run "defaults rep$REP" BENCH_DUMMY=0
  run "scan8 rep$REP" BENCH_SCAN=8
  run "scan4 rep$REP" BENCH_SCAN=4
done
for TCH in 2304 9216; do
  run "tch$TCH scan1" SEI_TRUNK_TCH=$TCH
  run "tch$TCH scan8" SEI_TRUNK_TCH=$TCH BENCH_SCAN=8
done
echo "=== queue_r4d done ===" | tee -a "$LOG"
