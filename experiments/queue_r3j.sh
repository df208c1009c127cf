#!/bin/bash
# Round-3j TPU queue: regenerate the training evidence lost to the 18:00
# VM re-provision (datasets survived via regeneration; checkpoints did not).
# Serialized on the one TPU client:
#   1. proposed(r2r) 300-epoch run  (honest-operating-point family ~ep200)
#   2. supervised 300-epoch equal-budget run
#   3. evals: r2r ckp_201/301, sup ckp_201/301
#   4. RESUME fine-tune from the best r2r ckpt at pinned low lr (reference
#      recipe: lr fixed, scheduler off) + eval
# Each stage tolerates a missing predecessor (logs and moves on).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

echo "=== [1/4] proposed r2r 300-epoch run ==="
timeout 14400 python demo/train.py \
  --task deblurring --kernel Gaussian_R2 --noise_level 5 \
  --method proposed --ProposedLoss__sure_alternative r2r \
  --dataset div2k --GroundTruthDataset__datasets_dir "$PWD/datasets" \
  --epochs 300 \
  --out_dir experiments/runs/dl_g2_r2r_300 2>&1 | grep -v WARN | tail -3

echo "=== [2/4] supervised 300-epoch run ==="
timeout 14400 python demo/train.py \
  --task deblurring --kernel Gaussian_R2 --noise_level 5 \
  --method sup --bf16 \
  --dataset div2k --GroundTruthDataset__datasets_dir "$PWD/datasets" \
  --epochs 300 \
  --out_dir experiments/runs/dl_g2_sup_300 2>&1 | grep -v WARN | tail -3

echo "=== [3/4] evals ==="
for spec in \
  "experiments/runs/dl_g2_r2r_300/checkpoints/ckp_201 r2r_ep201" \
  "experiments/runs/dl_g2_r2r_300/weights.pt r2r_ep300" \
  "experiments/runs/dl_g2_sup_300/checkpoints/ckp_201 sup_ep201" \
  "experiments/runs/dl_g2_sup_300/weights.pt sup_ep300"; do
  set -- $spec
  CKP=$1; TAG=$2
  if [ -d "$CKP" ]; then
    python experiments/ckpt_to_weights.py "$CKP" "/tmp/w_${TAG}.pt" 2>&1 | tail -1
    bash experiments/eval_parity.sh "/tmp/w_${TAG}.pt" "$TAG" \
      2>&1 | tee "experiments/evidence/eval_${TAG}.log"
  elif [ -f "$CKP" ]; then
    bash experiments/eval_parity.sh "$CKP" "$TAG" \
      2>&1 | tee "experiments/evidence/eval_${TAG}.log"
  else
    echo "missing checkpoint: $CKP"
  fi
done

echo "=== [4/4] RESUME fine-tune from r2r ckp_201, lr 2e-5 pinned ==="
if [ -d experiments/runs/dl_g2_r2r_300/checkpoints/ckp_201 ]; then
  timeout 7200 python demo/train.py \
    --task deblurring --kernel Gaussian_R2 --noise_level 5 \
    --method proposed --ProposedLoss__sure_alternative r2r \
    --dataset div2k --GroundTruthDataset__datasets_dir "$PWD/datasets" \
    --epochs 301 --lr 2e-5 \
    --RESUME experiments/runs/dl_g2_r2r_300/checkpoints/ckp_201 \
    --out_dir experiments/runs/dl_g2_r2r_ft 2>&1 | grep -v WARN | tail -3
  bash experiments/eval_parity.sh experiments/runs/dl_g2_r2r_ft/weights.pt r2r_ft \
    2>&1 | tee experiments/evidence/eval_r2r_ft.log
fi
echo "=== queue_r3j done ==="
