#!/bin/bash
# Round-3e TPU queue (chained after queue_r3d): equal-budget supervised run.
# The r2r proposed run is 500 epochs; the r2 supervised evidence stops at
# 300.  A fresh 500-epoch supervised run gives the equal-budget
# supervised / proposed(r2r) / unprocessed triple (VERDICT item 5).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

echo "=== supervised 500-epoch run ==="
timeout 28800 python demo/train.py \
  --task deblurring --kernel Gaussian_R2 --noise_level 5 \
  --method sup --bf16 \
  --dataset div2k --GroundTruthDataset__datasets_dir "$PWD/datasets" \
  --epochs 500 \
  --out_dir experiments/runs/dl_g2_sup_500 2>&1 | grep -v WARN | tail -3
echo "=== eval sup_500 ==="
bash experiments/eval_parity.sh experiments/runs/dl_g2_sup_500/weights.pt sup_500 \
  2>&1 | tee experiments/evidence/eval_sup_500.log
echo "=== queue_r3e done ==="
