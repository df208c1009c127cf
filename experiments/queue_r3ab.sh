#!/bin/bash
# Round-3ab TPU queue: REAL natural images (the closest this zero-egress
# environment gets to the paper's Div2K protocol — VERDICT "what's missing"
# item 2).  datasets/RealPhotos = 7 real photographs bundled with system
# packages (grace_hopper portrait, sklearn china/flower, dm_control grass,
# pygame webcam scene, gymnasium marble/foil textures).
#   A. Cross-domain generalization: the dead-leaves-trained Gaussian_R1
#      supervised + proposed(r2r) models evaluated on real photos.
#   B. Self-supervised adaptation: train proposed(r2r) ON the real photos'
#      measurements (no GT in the loss — the reference's single_image /
#      urban100 recipe generalized to a folder), eval on the same protocol.
#   C. A supervised-oracle row (sees the GT of the eval images; upper bound).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
EV=experiments/evidence
RP="gt_folder:$PWD/datasets/RealPhotos"

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

python experiments/make_realphotos.py  # idempotent; survives VM wipes

ev() {  # ev <task-args...> -- <weights-or-kind> <tag>
  local TASK=()
  while [ "$1" != "--" ]; do TASK+=("$1"); shift; done
  shift
  local W=$1 TAG=$2
  echo "=== eval $TAG ==="
  local MARGS=(--weights "$W"); [ -f "$W" ] || MARGS=(--model_kind "$W")
  timeout 5400 python demo/test.py "${TASK[@]}" --noise_level 5 \
    --dataset "$RP" "${MARGS[@]}" 2>&1 | grep -v WARN | tail -8 \
    | tee "$EV/eval_rp_${TAG}.log"
}

G1="--task deblurring --kernel Gaussian_R1"
G2="--task deblurring --kernel Gaussian_R2"

echo "=== [1/6] RealPhotos identity rows (G1 + G2) ==="
ev $G1 -- Identity g1_identity
ev $G2 -- Identity g2_identity

echo "=== [2/6] Cross-domain: dead-leaves-trained G1 models on real photos ==="
ev $G1 -- experiments/runs/dl_g1_sup_100/weights.pt g1_sup_xdomain
ev $G1 -- experiments/runs/dl_g1_r2r_100/weights.pt g1_r2r_xdomain

echo "=== [3/6] Self-sup adaptation: proposed r2r on RealPhotos, G2, 3000 ep (1 step/ep) ==="
timeout 14400 python demo/train.py $G2 --noise_level 5 --method proposed \
  --ProposedLoss__sure_alternative r2r --dataset "$RP" --epochs 3000 \
  --checkpoint_interval 500 --out_dir experiments/runs/rp_g2_r2r 2>&1 \
  | grep -v WARN | tail -3
cp experiments/runs/rp_g2_r2r/training.csv "$EV/rp_g2_r2r_training.csv" 2>/dev/null || true

echo "=== [4/6] Supervised-oracle adaptation (sees eval GT; upper bound) ==="
timeout 10800 python demo/train.py $G2 --noise_level 5 --method sup --bf16 \
  --dataset "$RP" --epochs 3000 --checkpoint_interval 500 \
  --out_dir experiments/runs/rp_g2_sup 2>&1 | grep -v WARN | tail -3

echo "=== [5/6] Adaptation evals ==="
ev $G2 -- experiments/runs/rp_g2_r2r/weights.pt g2_r2r_adapted
ev $G2 -- experiments/runs/rp_g2_sup/weights.pt g2_sup_oracle

echo "=== [6/6] checkpoint-trajectory evals (drift check on real statistics) ==="
for CKP in experiments/runs/rp_g2_r2r/checkpoints/ckp_*; do
  E=$(basename "$CKP" | sed 's/ckp_//')
  case "$E" in 0|00|000|0000) continue ;; esac  # skip the epoch-0 init
  if [ -d "$CKP" ]; then
    python experiments/ckpt_to_weights.py "$CKP" "/tmp/w_rp_$E.pt" 2>&1 | tail -1
    ev $G2 -- "/tmp/w_rp_$E.pt" "g2_r2r_adapted_ep$E"
  fi
done
echo "=== queue_r3ab done ==="
