#!/bin/bash
# Honest-bench triple (VERDICT r2 item 10), end-of-round-3 edition:
#   1. defaults            (fused trunk ON, saves ON for bf16, flat Adam)
#   2. saves OFF           (fused trunk ON, recompute backward)
#   3. fused trunk OFF     (stock XLA lowering)
# Keeps the Pallas kernel's and the saves' contributions auditable.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

echo "=== bench: defaults (fused ON, saves ON) ==="
timeout 2400 python bench.py 2>&1 | grep -v WARN | tail -1
echo "=== bench: saves OFF (recompute backward) ==="
SEI_TRUNK_SAVES=0 timeout 2400 python bench.py 2>&1 | grep -v WARN | tail -1
echo "=== bench: fused trunk OFF ==="
SEI_FUSED_TRUNK=0 timeout 2400 python bench.py 2>&1 | grep -v WARN | tail -1
echo "BENCH_TRIPLE_R3FINAL_DONE"
