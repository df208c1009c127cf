#!/bin/bash
# Round-3m TPU queue: regenerate the honest-operating-point evidence lost
# to the second VM re-provision (datasets + checkpoints wiped; the STATUS
# headline table cited eval logs that were never committed).  This re-runs
# the full campaign and tees EVERY artifact into experiments/evidence/ so
# it lands in git:
#   1. proposed(r2r, f32) 300-epoch run      [STATUS "Proposed (r2r)" rows]
#   2. supervised (bf16) 300-epoch run       [equal-budget comparator]
#   3. evals: identity, r2r ckp_101/151/201, sup ckp_101/201/300
#   4. RESUME fine-tune from r2r ckp_101 at pinned lr 2e-5 (reference
#      recipe: scheduler off, demo/train.py:213-230 parity) + eval
# Each stage tolerates a missing predecessor (logs and moves on).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
EV=experiments/evidence

echo "=== [1/4] proposed r2r 300-epoch run ==="
timeout 14400 python demo/train.py \
  --task deblurring --kernel Gaussian_R2 --noise_level 5 \
  --method proposed --ProposedLoss__sure_alternative r2r \
  --dataset div2k --GroundTruthDataset__datasets_dir "$PWD/datasets" \
  --epochs 300 \
  --out_dir experiments/runs/dl_g2_r2r_300 2>&1 | grep -v WARN | tail -3
cp experiments/runs/dl_g2_r2r_300/training.csv "$EV/r2r_300_training.csv" 2>/dev/null || true

echo "=== [2/4] supervised 300-epoch run ==="
timeout 14400 python demo/train.py \
  --task deblurring --kernel Gaussian_R2 --noise_level 5 \
  --method sup --bf16 \
  --dataset div2k --GroundTruthDataset__datasets_dir "$PWD/datasets" \
  --epochs 300 \
  --out_dir experiments/runs/dl_g2_sup_300 2>&1 | grep -v WARN | tail -3
cp experiments/runs/dl_g2_sup_300/training.csv "$EV/sup_300_training.csv" 2>/dev/null || true

echo "=== [3/4] evals ==="
bash experiments/eval_parity.sh Identity identity_r3 \
  2>&1 | tee "$EV/eval_identity_r3.log"
for spec in \
  "experiments/runs/dl_g2_r2r_300/checkpoints/ckp_101 r2r_ep101" \
  "experiments/runs/dl_g2_r2r_300/checkpoints/ckp_151 r2r_ep151" \
  "experiments/runs/dl_g2_r2r_300/checkpoints/ckp_201 r2r_ep201" \
  "experiments/runs/dl_g2_sup_300/checkpoints/ckp_101 sup_ep101" \
  "experiments/runs/dl_g2_sup_300/checkpoints/ckp_201 sup_ep201" \
  "experiments/runs/dl_g2_sup_300/weights.pt sup_ep300"; do
  set -- $spec
  CKP=$1; TAG=$2
  if [ -d "$CKP" ]; then
    python experiments/ckpt_to_weights.py "$CKP" "/tmp/w_${TAG}.pt" 2>&1 | tail -1
    bash experiments/eval_parity.sh "/tmp/w_${TAG}.pt" "$TAG" \
      2>&1 | tee "$EV/eval_${TAG}.log"
  elif [ -f "$CKP" ]; then
    bash experiments/eval_parity.sh "$CKP" "$TAG" \
      2>&1 | tee "$EV/eval_${TAG}.log"
  else
    echo "missing checkpoint: $CKP"
  fi
done

echo "=== [4/4] RESUME fine-tune from r2r ckp_101, lr 2e-5 pinned, 100 epochs ==="
if [ -d experiments/runs/dl_g2_r2r_300/checkpoints/ckp_101 ]; then
  timeout 7200 python demo/train.py \
    --task deblurring --kernel Gaussian_R2 --noise_level 5 \
    --method proposed --ProposedLoss__sure_alternative r2r \
    --dataset div2k --GroundTruthDataset__datasets_dir "$PWD/datasets" \
    --epochs 201 --lr 2e-5 \
    --RESUME experiments/runs/dl_g2_r2r_300/checkpoints/ckp_101 \
    --out_dir experiments/runs/dl_g2_r2r_ft101 2>&1 | grep -v WARN | tail -3
  cp experiments/runs/dl_g2_r2r_ft101/training.csv "$EV/r2r_ft101_training.csv" 2>/dev/null || true
  bash experiments/eval_parity.sh experiments/runs/dl_g2_r2r_ft101/weights.pt r2r_ft101 \
    2>&1 | tee "$EV/eval_r2r_ft101.log"
fi
echo "=== queue_r3m done ==="
