#!/bin/bash
# r5a probe: price the attention head-packing variants (VERDICT r4 item 4).
#
# The fused trunk packs heads into 128-lane tiles greedily (flagship
# C=180/nh=6 -> tiles of 4+2 heads; scores/att contract K=128 per tile).
# The old docstring priced this at "~6x the attention-matmul FLOPs of exact
# per-head attention" — but on the MXU a K=hd=30 contraction pads to the
# same 128-lane pass, so the inflation claim needs MEASURING, not arguing.
#
# Legs (SEI_TRUNK_HPT caps heads per lane tile, numerically inert —
# tests/test_swin_trunk.py::test_kernel_heads_per_tile_variants):
#   default — greedy packing (4+2 heads, 2 tiles, M-per-matmul 256/128)
#   hpt2    — 2 heads per tile (3 tiles, M=128)
#   hpt1    — exact per-head (6 tiles, M=64: the VERDICT's variant)
# Interleaved pairs x2 reps, full bench.py train step each leg.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
for rep in 1 2; do
  for leg in default hpt2 hpt1; do
    case $leg in
      default) unset SEI_TRUNK_HPT ;;
      hpt2) export SEI_TRUNK_HPT=2 ;;
      hpt1) export SEI_TRUNK_HPT=1 ;;
    esac
    echo "=== rep$rep $leg ==="
    timeout 1800 python bench.py 2>&1 | grep -v WARN | tail -1
  done
done
echo PROBE_R5A_DONE
