#!/bin/bash
# Re-run the patched r3z probe (conv dtype fix), chained after the triple.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
timeout 2400 python experiments/perf_probe_r3z.py 2>&1 | grep -v WARN \
  | tee experiments/evidence/perf_probe_r3z.log
echo "=== queue_r3z2 done ==="
