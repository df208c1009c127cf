#!/bin/bash
# DPS + DiffPIR_DRUNet end-to-end numbers with the locally trained DRUNet
# (VERDICT r2 item 6).  Run steps ONE AT A TIME (single TPU client).
# Usage: eval_denoiser_baselines.sh dps|diffpir [n_images]
set -u
cd "$(dirname "$0")/.."
N=${2:-5}
IDX=$(seq -s, 0 $((N - 1)))
KIND=$([ "$1" = dps ] && echo DPS || echo DiffPIR_DRUNet)
export SEI_DRUNET_WEIGHTS=${SEI_DRUNET_WEIGHTS:-$PWD/experiments/runs/drunet.npz}
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
echo "=== eval $KIND on $N images ==="
timeout 5400 python demo/test.py \
  --task deblurring --kernel Gaussian_R2 --noise_level 5 \
  --dataset div2k --GroundTruthDataset__datasets_dir "$PWD/datasets" \
  --model_kind "$KIND" --indices "$IDX" 2>&1 | grep -v WARN | tail -10
