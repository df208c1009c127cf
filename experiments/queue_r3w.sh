#!/bin/bash
# Round-3w TPU queue: relaunch the work interrupted by the second VM
# re-provision (2026-08-18): queue_r3u steps 4-8 (Gaussian_R1 triple) and
# all of queue_r3v (ei-shift method row + Box_R2 kernel triple).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
EV=experiments/evidence
DD="--dataset div2k --GroundTruthDataset__datasets_dir $PWD/datasets"

ev() {  # ev <task-args...> -- <weights-or-kind> <tag>
  local TASK=()
  while [ "$1" != "--" ]; do TASK+=("$1"); shift; done
  shift
  local W=$1 TAG=$2
  echo "=== eval $TAG ==="
  local MARGS=(--weights "$W"); [ -f "$W" ] || MARGS=(--model_kind "$W")
  timeout 5400 python demo/test.py "${TASK[@]}" --noise_level 5 $DD \
    "${MARGS[@]}" 2>&1 | grep -v WARN | tail -8 | tee "$EV/eval_${TAG}.log"
}

G1="--task deblurring --kernel Gaussian_R1"
G2="--task deblurring --kernel Gaussian_R2"
BOX="--task deblurring --kernel Box_R2"

echo "=== [1/10] deblurring Gaussian_R1 supervised bf16 100 ep ==="
timeout 10800 python demo/train.py $G1 --noise_level 5 --method sup --bf16 \
  $DD --epochs 100 --out_dir experiments/runs/dl_g1_sup_100 2>&1 | grep -v WARN | tail -3

echo "=== [2/10] deblurring Gaussian_R1 proposed r2r f32 100 ep ==="
timeout 14400 python demo/train.py $G1 --noise_level 5 --method proposed \
  --ProposedLoss__sure_alternative r2r $DD --epochs 100 \
  --out_dir experiments/runs/dl_g1_r2r_100 2>&1 | grep -v WARN | tail -3
cp experiments/runs/dl_g1_r2r_100/training.csv "$EV/dl_g1_r2r_training.csv" 2>/dev/null || true

echo "=== [3/10] Gaussian_R1 evals ==="
ev $G1 -- Identity g1_identity
ev $G1 -- experiments/runs/dl_g1_sup_100/weights.pt g1_sup_ep100
ev $G1 -- experiments/runs/dl_g1_r2r_100/weights.pt g1_r2r_ep100

echo "=== [4/10] Gaussian_R1 r2r loss-min checkpoint eval (if drifted) ==="
for CKP in experiments/runs/dl_g1_r2r_100/checkpoints/ckp_051; do
  if [ -d "$CKP" ]; then
    python experiments/ckpt_to_weights.py "$CKP" /tmp/w_g1r2r51.pt 2>&1 | tail -1
    ev $G1 -- /tmp/w_g1r2r51.pt g1_r2r_ep051
  fi
done

echo "=== [5/10] ei-shift (r2r) f32 100 ep, Gaussian_R2 ==="
timeout 14400 python demo/train.py $G2 --noise_level 5 --method proposed \
  --ProposedLoss__transforms Shifts --ProposedLoss__sure_alternative r2r \
  $DD --epochs 100 --out_dir experiments/runs/dl_g2_eishift_100 2>&1 | grep -v WARN | tail -3
cp experiments/runs/dl_g2_eishift_100/training.csv "$EV/eishift_training.csv" 2>/dev/null || true

echo "=== [6/10] ei-shift eval ==="
ev $G2 -- experiments/runs/dl_g2_eishift_100/weights.pt eishift_ep100

echo "=== [7/10] Box_R2 supervised bf16 100 ep ==="
timeout 10800 python demo/train.py $BOX --noise_level 5 --method sup --bf16 \
  $DD --epochs 100 --out_dir experiments/runs/dl_box2_sup_100 2>&1 | grep -v WARN | tail -3

echo "=== [8/10] Box_R2 proposed r2r f32 100 ep ==="
timeout 14400 python demo/train.py $BOX --noise_level 5 --method proposed \
  --ProposedLoss__sure_alternative r2r $DD --epochs 100 \
  --out_dir experiments/runs/dl_box2_r2r_100 2>&1 | grep -v WARN | tail -3
cp experiments/runs/dl_box2_r2r_100/training.csv "$EV/box2_r2r_training.csv" 2>/dev/null || true

echo "=== [9/10] Box_R2 evals ==="
ev $BOX -- Identity box2_identity
ev $BOX -- experiments/runs/dl_box2_sup_100/weights.pt box2_sup_ep100
ev $BOX -- experiments/runs/dl_box2_r2r_100/weights.pt box2_r2r_ep100

echo "=== [10/10] done ==="
echo "=== queue_r3w done ==="
