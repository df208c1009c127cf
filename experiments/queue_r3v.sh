#!/bin/bash
# Round-3v TPU queue: finish the paper's method/kernel grid.
#   A. ei-shift method row (ref README.md:60 "--method ei-shift" =
#      --method proposed --ProposedLoss__transforms Shifts,
#      ref src/losses/__init__.py:91-94), r2r variant for stability,
#      deblurring Gaussian_R2 noise 5 — completes the family
#      sup/css/sure/ei-shift/ei-rotate/proposed.
#   B. Box_R2 deblurring triple (the paper's second kernel family,
#      ref src/physics/kernels.py Box_R*): Identity + sup + proposed r2r.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
EV=experiments/evidence
DD="--dataset div2k --GroundTruthDataset__datasets_dir $PWD/datasets"

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

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

G2="--task deblurring --kernel Gaussian_R2"
BOX="--task deblurring --kernel Box_R2"

echo "=== [1/6] ei-shift (r2r) f32 100 ep, Gaussian_R2 ==="
timeout 14400 python demo/train.py $G2 --noise_level 5 --method proposed \
  --ProposedLoss__transforms Shifts --ProposedLoss__sure_alternative r2r \
  $DD --epochs 100 --out_dir experiments/runs/dl_g2_eishift_100 2>&1 | grep -v WARN | tail -3
cp experiments/runs/dl_g2_eishift_100/training.csv "$EV/eishift_training.csv" 2>/dev/null || true

echo "=== [2/6] ei-shift eval ==="
ev $G2 -- experiments/runs/dl_g2_eishift_100/weights.pt eishift_ep100

echo "=== [3/6] Box_R2 supervised bf16 100 ep ==="
timeout 10800 python demo/train.py $BOX --noise_level 5 --method sup --bf16 \
  $DD --epochs 100 --out_dir experiments/runs/dl_box2_sup_100 2>&1 | grep -v WARN | tail -3

echo "=== [4/6] Box_R2 proposed r2r f32 100 ep ==="
timeout 14400 python demo/train.py $BOX --noise_level 5 --method proposed \
  --ProposedLoss__sure_alternative r2r $DD --epochs 100 \
  --out_dir experiments/runs/dl_box2_r2r_100 2>&1 | grep -v WARN | tail -3
cp experiments/runs/dl_box2_r2r_100/training.csv "$EV/box2_r2r_training.csv" 2>/dev/null || true

echo "=== [5/6] Box_R2 evals ==="
ev $BOX -- Identity box2_identity
ev $BOX -- experiments/runs/dl_box2_sup_100/weights.pt box2_sup_ep100
ev $BOX -- experiments/runs/dl_box2_r2r_100/weights.pt box2_r2r_ep100

echo "=== [6/6] done ==="
echo "=== queue_r3v done ==="
