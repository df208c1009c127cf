#!/bin/bash
# End-to-end parity evaluation on the dead-leaves Div2K stand-in
# (BASELINE.md protocol: val split, deterministic seeds, 8-bit quantize,
# Y-channel PSNR/SSIM).  Usage: eval_parity.sh <weights.pt|Identity> [tag]
set -u
W=$1; TAG=${2:-$(basename "$(dirname "$W")" 2>/dev/null || echo "$W")}
cd "$(dirname "$0")/.."
ARGS=(--task deblurring --kernel Gaussian_R2 --noise_level 5
      --dataset div2k --GroundTruthDataset__datasets_dir "$PWD/datasets")
if [ "$W" = "Identity" ]; then
  ARGS+=(--model_kind Identity)
else
  ARGS+=(--weights "$W")
fi
echo "=== eval $TAG ==="
JAX_COMPILATION_CACHE_DIR=/root/jaxcache timeout 3000 \
  python demo/test.py "${ARGS[@]}" 2>&1 | grep -v WARN | tail -12
