#!/bin/bash
# r5b probe: two cheap dispatch/chunking levers at the flagship bench point.
#   scan16  — BENCH_SCAN=16 (r4d measured scan4/scan8; is there more left?)
#   wch6/18 — SEI_TRUNK_WCH window-chunk sweep around the default 12
#             (TCH was re-swept flat at the flat-state head in r4d; WCH was
#             last swept before the round-4 trainer restructure)
# Interleaved pairs x2 reps vs the production default leg.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
for rep in 1 2; do
  for leg in default scan16 wch6 wch18; do
    unset SEI_TRUNK_WCH BENCH_SCAN 2>/dev/null || true
    case $leg in
      scan16) export BENCH_SCAN=16 ;;
      wch6) export SEI_TRUNK_WCH=6 ;;
      wch18) export SEI_TRUNK_WCH=18 ;;
    esac
    echo "=== rep$rep $leg ==="
    timeout 1800 python bench.py 2>&1 | grep -v WARN | tail -1
  done
done
echo PROBE_R5B_DONE
