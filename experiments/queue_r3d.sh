#!/bin/bash
# Round-3d TPU queue (chained after queue_r3c): post-conv_mm step
# decomposition + the scan-path bench variant.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

echo "=== perf probe (conv_mm ON) ==="
timeout 2400 python experiments/perf_probe_r3b.py 2>&1 | grep -v WARN
echo "=== perf probe (conv_mm OFF) ==="
SEI_CONV_MM=0 timeout 2400 python experiments/perf_probe_r3b.py 2>&1 | grep -v WARN
echo "=== bench: scan_steps=8 ==="
BENCH_SCAN=8 timeout 2400 python bench.py 2>&1 | grep -v WARN | tail -2
echo "=== queue_r3d done ==="
