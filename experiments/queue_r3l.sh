#!/bin/bash
# Round-3l TPU queue: supplementary honest-operating-point evals.  The r3j
# r2r run entered the oscillation regime earlier than the pre-wipe twin
# (loss min ~1.24e-2 near epoch 96; ckp_201 already degraded: 18.57 dB <
# Identity's 19.57), so the checkpoint family around the LOSS MINIMUM is
# the honest operating point: eval ckp_101/ckp_151 + the equal-budget
# supervised ckp_101, and fine-tune from ckp_101 at the reference's pinned
# low lr instead of ckp_201.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

for spec in \
  "experiments/runs/dl_g2_r2r_300/checkpoints/ckp_101 r2r_ep101" \
  "experiments/runs/dl_g2_r2r_300/checkpoints/ckp_151 r2r_ep151" \
  "experiments/runs/dl_g2_sup_300/checkpoints/ckp_101 sup_ep101"; do
  set -- $spec
  CKP=$1; TAG=$2
  if [ -d "$CKP" ]; then
    python experiments/ckpt_to_weights.py "$CKP" "/tmp/w_${TAG}.pt" 2>&1 | tail -1
    bash experiments/eval_parity.sh "/tmp/w_${TAG}.pt" "$TAG" \
      2>&1 | tee "experiments/evidence/eval_${TAG}.log"
  else
    echo "missing checkpoint: $CKP"
  fi
done

echo "=== identity (unprocessed) control on this dataset build ==="
bash experiments/eval_parity.sh Identity identity_r3 \
  2>&1 | tee experiments/evidence/eval_identity_r3.log

echo "=== RESUME fine-tune from r2r ckp_101, lr 2e-5 pinned, 100 epochs ==="
timeout 7200 python demo/train.py \
  --task deblurring --kernel Gaussian_R2 --noise_level 5 \
  --method proposed --ProposedLoss__sure_alternative r2r \
  --dataset div2k --GroundTruthDataset__datasets_dir "$PWD/datasets" \
  --epochs 201 --lr 2e-5 \
  --RESUME experiments/runs/dl_g2_r2r_300/checkpoints/ckp_101 \
  --out_dir experiments/runs/dl_g2_r2r_ft101 2>&1 | grep -v WARN | tail -3
bash experiments/eval_parity.sh experiments/runs/dl_g2_r2r_ft101/weights.pt r2r_ft101 \
  2>&1 | tee experiments/evidence/eval_r2r_ft101.log
echo "=== queue_r3l done ==="
