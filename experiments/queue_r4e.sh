#!/bin/bash
# Round-4e TPU queue (after queue_r4_chain): retry of queue_r4b item 3 —
# the DiffUNet stand-in training crashed on the GroupNorm(32) width bug
# (model_channels=48; fixed to 64 + config validation).  Re-runs the
# training and the DiffPIR_DiffUNet row.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
EV=experiments/evidence
DD="--GroundTruthDataset__datasets_dir $PWD/datasets"
G2="--task deblurring --kernel Gaussian_R2"
mkdir -p experiments/runs

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

echo "=== DiffUNet stand-in training (retry, model_channels=64) ==="
timeout 10800 python experiments/train_diffunet.py \
  --out experiments/runs/diffunet.pt 2>&1 | grep -v WARN | tail -5 \
  | tee "$EV/diffunet_training.log"
SEI_DIFFUNET_WEIGHTS=$PWD/experiments/runs/diffunet.pt \
  timeout 5400 python demo/test.py $G2 --noise_level 5 --dataset div2k $DD \
  --model_kind DiffPIR_DiffUNet --indices 0,1,2,3,4 2>&1 | grep -v WARN \
  | tail -8 | tee "$EV/eval_diffpir_diffunet.log"
echo "=== queue_r4e done ==="
