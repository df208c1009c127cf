#!/bin/bash
# Round-3f TPU queue (chained after queue_r3e): honest-operating-point
# evals.  The 500-epoch r2r run destabilizes past ~epoch 200 (loss
# oscillates at ~6x its minimum; see STATUS drift analysis), so the
# checkpoint family around the minimum is the real result:
#   - r2r ckp_151 / ckp_201 evals
#   - supervised ckp_201 eval (equal-budget comparator)
#   - RESUME fine-tune from the best r2r checkpoint at pinned low lr
#     (the reference's own RESUME recipe: lr fixed, scheduler off), then
#     eval that.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

for spec in \
  "experiments/runs/dl_g2_r2r_500/checkpoints/ckp_151 r2r_ep151" \
  "experiments/runs/dl_g2_r2r_500/checkpoints/ckp_201 r2r_ep201" \
  "experiments/runs/dl_g2_supervised/checkpoints/ckp_201 sup_ep201"; do
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

echo "=== RESUME fine-tune from r2r ckp_201, lr 2e-5 pinned, 100 epochs ==="
timeout 14400 python demo/train.py \
  --task deblurring --kernel Gaussian_R2 --noise_level 5 \
  --method proposed --ProposedLoss__sure_alternative r2r \
  --dataset div2k --GroundTruthDataset__datasets_dir "$PWD/datasets" \
  --epochs 301 --lr 2e-5 \
  --RESUME experiments/runs/dl_g2_r2r_500/checkpoints/ckp_201 \
  --out_dir experiments/runs/dl_g2_r2r_ft 2>&1 | grep -v WARN | tail -3
echo "=== eval r2r_ft ==="
bash experiments/eval_parity.sh experiments/runs/dl_g2_r2r_ft/weights.pt r2r_ft \
  2>&1 | tee experiments/evidence/eval_r2r_ft.log
echo "=== queue_r3f done ==="
