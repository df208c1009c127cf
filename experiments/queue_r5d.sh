#!/bin/bash
# Round-5d TPU queue (after the r5b/r5c lock holders finish):
#   A. Training-METHOD rows on REAL statistics: css / sure / noise2inverse
#      trained on the RealPhotos measurements at deblurring Gaussian_R2
#      noise 5 (the r3q methods-breadth campaign re-run on real photos; the
#      r2r/sup/identity rows already exist from r3ab).  3000 epochs like
#      every RealPhotos adaptation; sure evaluated at BOTH its early-horizon
#      checkpoint (its dead-leaves drift horizon was ~ep51/100) and final.
#   B. Real-photo CT-like triple (identity / r2r / sup-oracle) — puts the
#      third task family on real statistics (currently stand-in only).
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/sei_queue.lock
until mkdir "$LOCK" 2>/dev/null; do sleep 15; done
trap 'rmdir "$LOCK"' EXIT
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
EV=experiments/evidence
RP="gt_folder:$PWD/datasets/RealPhotos"
G2="--task deblurring --kernel Gaussian_R2"
CT="--task invert_a_tomography_like_filter"
mkdir -p experiments/runs

ev() {  # ev <task/extra-args...> -- <weights-or-kind> <tag> [wrap-args...]
  local EXTRA=()
  while [ "$1" != "--" ]; do EXTRA+=("$1"); shift; done
  shift
  local W=$1 TAG=$2; shift 2
  echo "=== eval $TAG ==="
  local MARGS=(--weights "$W"); [ -e "$W" ] || MARGS=(--model_kind "$W")
  timeout 5400 python demo/test.py --noise_level 5 --dataset "$RP" \
    "${EXTRA[@]}" "${MARGS[@]}" "$@" 2>&1 | grep -v WARN | tail -8 \
    | tee "$EV/eval_rp_${TAG}.log"
}

echo "=== [A] method rows on RealPhotos: css / sure / noise2inverse (G2) ==="
timeout 10800 python demo/train.py $G2 --noise_level 5 --method css --bf16 \
  --dataset "$RP" --epochs 3000 --checkpoint_interval 1000 \
  --out_dir experiments/runs/rp_g2_css 2>&1 | grep -v WARN | tail -3
ev $G2 -- experiments/runs/rp_g2_css/weights.pt g2_css

timeout 10800 python demo/train.py $G2 --noise_level 5 --method sure \
  --dataset "$RP" --epochs 3000 --checkpoint_interval 500 \
  --out_dir experiments/runs/rp_g2_sure 2>&1 | grep -v WARN | tail -3
cp experiments/runs/rp_g2_sure/training.csv "$EV/rp_g2_sure_training.csv" 2>/dev/null || true
ev $G2 -- experiments/runs/rp_g2_sure/weights.pt g2_sure
ev $G2 -- experiments/runs/rp_g2_sure/checkpoints/ckp_1501 g2_sure_ep1501

timeout 10800 python demo/train.py $G2 --noise_level 5 --method noise2inverse \
  --bf16 --dataset "$RP" --epochs 3000 --checkpoint_interval 1000 \
  --out_dir experiments/runs/rp_g2_n2i 2>&1 | grep -v WARN | tail -3
ev $G2 -- experiments/runs/rp_g2_n2i/weights.pt g2_n2i --noise2inverse

echo "=== [B] real-photo CT-like triple ==="
ev $CT -- Identity ct_identity
timeout 10800 python demo/train.py $CT --noise_level 5 --method proposed \
  --ProposedLoss__sure_alternative r2r --dataset "$RP" --epochs 3000 \
  --checkpoint_interval 1000 \
  --out_dir experiments/runs/rp_ct_r2r 2>&1 | grep -v WARN | tail -3
cp experiments/runs/rp_ct_r2r/training.csv "$EV/rp_ct_r2r_training.csv" 2>/dev/null || true
ev $CT -- experiments/runs/rp_ct_r2r/weights.pt ct_r2r_adapted
timeout 10800 python demo/train.py $CT --noise_level 5 --method sup --bf16 \
  --dataset "$RP" --epochs 3000 --checkpoint_interval 1000 \
  --out_dir experiments/runs/rp_ct_sup 2>&1 | grep -v WARN | tail -3
ev $CT -- experiments/runs/rp_ct_sup/weights.pt ct_sup_oracle
echo "=== queue_r5d done ==="
