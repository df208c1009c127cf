#!/bin/bash
# Round-3ad TPU queue: exercise the remaining dataset families end-to-end.
#   A. urban100 (ref demo/train.py urban100 recipe: 90 train / 10 val,
#      checkpoint cadence 400): proposed r2r at 1/10 of the reference's
#      4000-epoch budget, eval on the val split (imgs 91-100).
#   B. single_image mode (ref src/datasets/single_image.py): train on ONE
#      image's measurement, eval on that image — the reference's
#      per-image self-supervised recipe.
# Urban100 stand-in: dead-leaves images copied into the Urban100 layout
# (img_{i:03d}.png) — same generator and statistics as the Div2K stand-in.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
EV=experiments/evidence
DD="--GroundTruthDataset__datasets_dir $PWD/datasets"
G2="--task deblurring --kernel Gaussian_R2"

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

echo "=== [0/5] build Urban100-layout stand-in ==="
mkdir -p datasets/Urban100/Urban100_HR
for i in $(seq 1 100); do
  src=$(printf "datasets/DIV2K/DIV2K_train_HR/%04d.png" "$i")
  dst=$(printf "datasets/Urban100/Urban100_HR/img_%03d.png" "$i")
  [ -f "$dst" ] || cp "$src" "$dst"
done

ev() {  # ev <extra-args...> -- <weights-or-kind> <tag>
  local EXTRA=()
  while [ "$1" != "--" ]; do EXTRA+=("$1"); shift; done
  shift
  local W=$1 TAG=$2
  echo "=== eval $TAG ==="
  local MARGS=(--weights "$W"); [ -f "$W" ] || MARGS=(--model_kind "$W")
  timeout 5400 python demo/test.py $G2 --noise_level 5 "${EXTRA[@]}" \
    "${MARGS[@]}" 2>&1 | grep -v WARN | tail -8 | tee "$EV/eval_${TAG}.log"
}

echo "=== [1/5] urban100 proposed r2r, 400 ep (1/10 of the ref's 4000) ==="
timeout 14400 python demo/train.py $G2 --noise_level 5 --method proposed \
  --ProposedLoss__sure_alternative r2r --dataset urban100 $DD --epochs 400 \
  --out_dir experiments/runs/u100_r2r_400 2>&1 | grep -v WARN | tail -3
cp experiments/runs/u100_r2r_400/training.csv "$EV/u100_r2r_training.csv" 2>/dev/null || true

echo "=== [2/5] urban100 evals (val split: img_091-100) ==="
ev --dataset urban100 $DD -- Identity u100_identity
ev --dataset urban100 $DD -- experiments/runs/u100_r2r_400/weights.pt u100_r2r_ep400

echo "=== [3/5] single_image proposed r2r, 100 ep ==="
timeout 7200 python demo/train.py $G2 --noise_level 5 --method proposed \
  --ProposedLoss__sure_alternative r2r --dataset single_image \
  --SingleImageDataset__image_path datasets/DIV2K/DIV2K_valid_HR/0801.png \
  --SingleImageDataset__duplicates_count 64 --epochs 100 \
  --out_dir experiments/runs/si_r2r_100 2>&1 | grep -v WARN | tail -3

echo "=== [4/5] single_image evals ==="
SI="--dataset single_image --SingleImageDataset__image_path datasets/DIV2K/DIV2K_valid_HR/0801.png --SingleImageDataset__duplicates_count 1"
ev $SI -- Identity si_identity
ev $SI -- experiments/runs/si_r2r_100/weights.pt si_r2r_ep100

echo "=== [5/5] done ==="
echo "=== queue_r3ad done ==="
