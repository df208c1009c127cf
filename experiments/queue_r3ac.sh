#!/bin/bash
# Round-3ac TPU queue: scan-steps bench probe.  The trainer's lax.scan path
# (demo/train.py --scan_steps) fuses N train steps per dispatch; through the
# axon tunnel each dispatch costs ~3-5 ms that a co-located TPU host would
# not pay.  Probe whether amortizing it moves the headline bench past 3x.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
EV=experiments/evidence

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

{
  echo "=== bench scan probe $(date -u +%FT%TZ) ==="
  for SCAN in 1 8 1 8; do   # interleaved pairs: control run-to-run drift
    echo "--- BENCH_SCAN=$SCAN ---"
    BENCH_SCAN=$SCAN timeout 3600 python bench.py 2>&1 | grep -v WARN | tail -1
  done
  # scan=4 midpoint, once
  echo "--- BENCH_SCAN=4 ---"
  BENCH_SCAN=4 timeout 3600 python bench.py 2>&1 | grep -v WARN | tail -1
} | tee "$EV/bench_scan_probe_r3ac.log"
echo "=== queue_r3ac done ==="
