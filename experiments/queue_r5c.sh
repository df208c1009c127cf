#!/bin/bash
# Round-5c TPU queue (after queue_r5b releases the lock):
#   1. perf_probe_r5b — scan16 + window-chunk sweep (see probe header).
#   2. Round-final honest-bench quadruple (the r5 successor of
#      bench_quadruple_r4final: defaults / per-step / saves-off / fused-off).
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/sei_queue.lock
until mkdir "$LOCK" 2>/dev/null; do sleep 15; done
trap 'rmdir "$LOCK"' EXIT
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
EV=experiments/evidence

echo "=== [1/2] scan16 + WCH probe ==="
bash experiments/perf_probe_r5b.sh 2>&1 | tee "$EV/perf_probe_r5b.log"

echo "=== [2/2] round-final honest-bench quadruple (r5) ==="
{
  echo "=== bench: defaults (scan8, fused ON, saves ON) ==="
  timeout 1800 python bench.py 2>&1 | grep -v WARN | tail -1
  echo "=== bench: per-step dispatch (BENCH_SCAN=1) ==="
  BENCH_SCAN=1 timeout 1800 python bench.py 2>&1 | grep -v WARN | tail -1
  echo "=== bench: saves OFF (recompute backward) ==="
  SEI_TRUNK_SAVES=0 timeout 1800 python bench.py 2>&1 | grep -v WARN | tail -1
  echo "=== bench: fused trunk OFF ==="
  SEI_FUSED_TRUNK=0 timeout 1800 python bench.py 2>&1 | grep -v WARN | tail -1
  echo BENCH_QUADRUPLE_R5FINAL_DONE
} | tee "$EV/bench_quadruple_r5final.log"
echo "=== queue_r5c done ==="
