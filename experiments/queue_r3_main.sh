#!/bin/bash
# Round-3 TPU queue: wait for the current TPU client to exit, then run the
# long stable proposed run with the r2r SURE alternative (VERDICT r2 item 5:
# full reference protocol, 500 epochs, reference hyperparameters).
# One TPU client at a time (axon relay constraint).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

echo "=== long r2r proposed run (500 epochs) ==="
timeout 28800 python demo/train.py \
  --task deblurring --kernel Gaussian_R2 --noise_level 5 \
  --method proposed --ProposedLoss__sure_alternative r2r \
  --dataset div2k --GroundTruthDataset__datasets_dir "$PWD/datasets" \
  --epochs 500 \
  --out_dir experiments/runs/dl_g2_r2r_500
echo "=== train done rc=$? ==="
