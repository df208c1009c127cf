#!/bin/bash
# Round-3s TPU queue: post-breadth perf tail, chained behind queue_r3r.
#   1. bench pair: defaults vs SEI_CONV_HYBRID=1 (9-tap shift-matmul
#      forward + native-conv backward via linear_transpose; decides the
#      hybrid default)
#   2. round-final honest bench triple (defaults / saves OFF / fused OFF)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
EV=experiments/evidence

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

echo "=== [1/2] bench pair: defaults vs conv-hybrid ==="
{
  echo "--- defaults ---"
  timeout 2400 python bench.py 2>&1 | grep -v WARN | tail -1
  echo "--- SEI_CONV_HYBRID=1 ---"
  SEI_CONV_HYBRID=1 timeout 2400 python bench.py 2>&1 | grep -v WARN | tail -1
} | tee "$EV/bench_pair_r3s.log"

echo "=== [2/2] round-final honest bench triple ==="
{
  echo "--- defaults (fused ON, saves ON) ---"
  timeout 2400 python bench.py 2>&1 | grep -v WARN | tail -1
  echo "--- SEI_TRUNK_SAVES=0 (recompute backward) ---"
  SEI_TRUNK_SAVES=0 timeout 2400 python bench.py 2>&1 | grep -v WARN | tail -1
  echo "--- SEI_FUSED_TRUNK=0 (stock XLA) ---"
  SEI_FUSED_TRUNK=0 timeout 2400 python bench.py 2>&1 | grep -v WARN | tail -1
} | tee "$EV/bench_triple_r3final.log"
echo "=== queue_r3s done ==="
