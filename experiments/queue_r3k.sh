#!/bin/bash
# Round-3k TPU queue (chained after queue_r3j): denoiser-prior baselines.
# Regenerates the DRUNet artifacts lost to the VM re-provision and produces
# the PnP / DiffPIR / DPS rows, including the wide-sigma retrain that the
# diffusion samplers need (their sigma_t range far exceeds the DPIR
# training range; the reference inherits the same ceiling from deepinv).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

echo "=== [1/5] standard DRUNet train (sigma U(0, 55/255)) ==="
timeout 5400 python experiments/train_drunet.py --steps 6000 \
  --out experiments/runs/drunet.npz 2>&1 | grep -v WARN | tail -6

echo "=== [2/5] wide-sigma DRUNet train (log-uniform to 80) ==="
timeout 5400 python experiments/train_drunet.py --steps 6000 \
  --sigma_dist log --sigma_max 80.0 \
  --out experiments/runs/drunet_wide.npz 2>&1 | grep -v WARN | tail -6

echo "=== [3/5] PnP (DPIR/HQS) with standard DRUNet ==="
SEI_DRUNET_WEIGHTS=$PWD/experiments/runs/drunet.npz \
timeout 5400 python demo/test.py \
  --task deblurring --kernel Gaussian_R2 --noise_level 5 \
  --dataset div2k --GroundTruthDataset__datasets_dir "$PWD/datasets" \
  --model_kind PlugAndPlay --indices 0,1,2,3,4 \
  2>&1 | grep -v WARN | tail -8 | tee experiments/evidence/eval_pnp_r3.log

echo "=== [4/5] DPS with wide DRUNet ==="
SEI_DRUNET_WEIGHTS=$PWD/experiments/runs/drunet_wide.npz \
  bash experiments/eval_denoiser_baselines.sh dps 5 \
  2>&1 | tee experiments/evidence/eval_dps_wide.log
echo "=== [5/5] DiffPIR with wide DRUNet ==="
SEI_DRUNET_WEIGHTS=$PWD/experiments/runs/drunet_wide.npz \
  bash experiments/eval_denoiser_baselines.sh diffpir 5 \
  2>&1 | tee experiments/evidence/eval_diffpir_wide.log
echo "=== queue_r3k done ==="
