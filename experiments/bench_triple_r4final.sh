#!/bin/bash
# Honest-bench quadruple, end-of-round-4 edition:
#   1. defaults            (scan-fused dispatch x8, fused trunk ON, saves ON)
#   2. per-step dispatch   (BENCH_SCAN=1 — the round-3 methodology)
#   3. saves OFF           (fused trunk ON, recompute backward)
#   4. fused trunk OFF     (stock XLA lowering)
# Keeps the scan dispatch's, the Pallas kernel's, and the saves'
# contributions individually auditable.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

echo "=== bench: defaults (scan8, fused ON, saves ON) ==="
timeout 2400 python bench.py 2>&1 | grep -v WARN | tail -1
echo "=== bench: per-step dispatch (BENCH_SCAN=1) ==="
BENCH_SCAN=1 timeout 2400 python bench.py 2>&1 | grep -v WARN | tail -1
echo "=== bench: saves OFF (recompute backward) ==="
SEI_TRUNK_SAVES=0 timeout 2400 python bench.py 2>&1 | grep -v WARN | tail -1
echo "=== bench: fused trunk OFF ==="
SEI_FUSED_TRUNK=0 timeout 2400 python bench.py 2>&1 | grep -v WARN | tail -1
echo "BENCH_TRIPLE_R4FINAL_DONE"
