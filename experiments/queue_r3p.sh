#!/bin/bash
# Round-3p TPU queue: the r3n probe/bench tail, chained behind the
# auto-restarted queue_r3m_regen.sh (which owns the TPU until its stage-4
# ft101 fine-tune + eval completes).  One TPU client at a time.
#   1. r3z probe: post-gelu-saves step decomposition (conv path, LN, EI glue)
#   2. r3y probe: chunk-knob sweep + optimizer ravel-cost isolation
#   3. bench pair: defaults vs SEI_CONV_TAPS=1 (decides the taps default)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
EV=experiments/evidence

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

echo "=== [1/3] perf_probe_r3z ==="
timeout 2400 python experiments/perf_probe_r3z.py 2>&1 | grep -v WARN | tee "$EV/perf_probe_r3z.log"

echo "=== [2/3] perf_probe_r3y ==="
timeout 2400 python experiments/perf_probe_r3y.py 2>&1 | grep -v WARN | tee "$EV/perf_probe_r3y.log"

echo "=== [3/3] bench pair ==="
{ echo "--- defaults ---"
  timeout 1800 python bench.py 2>&1 | tail -1
  echo "--- SEI_CONV_TAPS=1 ---"
  SEI_CONV_TAPS=1 timeout 1800 python bench.py 2>&1 | tail -1
} | tee "$EV/bench_pair_r3n.log"
echo "=== queue_r3p done ==="
