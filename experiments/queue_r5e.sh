#!/bin/bash
# Round-5e TPU queue: the COMPLETE baseline-model table on REAL statistics.
# Every reference --model_kind row evaluated on the RealPhotos protocol
# (deblurring Gaussian_R2 noise 5) — extending r3's dead-leaves baseline
# table to real photographs:
#   - training-free rows: InverseFilter, BM3D (capped at 3 images — BM3D's
#     grouped collaborative filtering is the slowest baseline; the cap is
#     logged, not silent), TV
#   - denoiser-prior rows: PlugAndPlay, DiffPIR_DRUNet, DPS (need a DRUNet:
#     retrained first — the r3 drunet.npz was wiped with the VM), and
#     DiffPIR_DiffUNet (diffunet.pt survives from queue_r4g/r5a)
#   - per-image-optimization row: DeepImagePrior
#   - data-scarcity protocol: proposed-r2r trained on a SINGLE real photo
#     (the reference's single_image recipe on real statistics)
# Identity + r2r + sup-oracle G2 rows already exist from r3ab.
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
mkdir -p experiments/runs

ev() {  # ev <extra-args...> -- <weights-or-kind> <tag> [more-args...]
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

echo "=== [1/4] training-free baselines on RealPhotos ==="
ev $G2 -- InverseFilter g2_inversefilter
ev $G2 -- TV g2_tv
echo "(BM3D capped at 3 of 7 images for cost — the cap is this line)"
ev $G2 -- BM3D g2_bm3d_3imgs --indices 0,1,2

echo "=== [2/4] retrain DRUNet (stand-in for published drunet_color) ==="
timeout 5400 python experiments/train_drunet.py --steps 6000 \
  --out experiments/runs/drunet.npz 2>&1 | grep -v WARN | tail -4 \
  | tee "$EV/drunet_training_r5.log"

echo "=== [3/4] denoiser-prior + per-image-optimization rows ==="
export SEI_DRUNET_WEIGHTS=$PWD/experiments/runs/drunet.npz
export SEI_DIFFUNET_WEIGHTS=$PWD/experiments/runs/diffunet.pt
ev $G2 -- PlugAndPlay g2_pnp
ev $G2 -- DiffPIR_DRUNet g2_diffpir_drunet
ev $G2 -- DiffPIR_DiffUNet g2_diffpir_diffunet
ev $G2 -- DPS g2_dps
ev $G2 -- DeepImagePrior g2_dip

echo "=== [4/4] single-real-photo self-sup training (data-scarcity row) ==="
mkdir -p datasets/RealPhotoOne
cp "$(ls datasets/RealPhotos/* | head -1)" datasets/RealPhotoOne/
RP1="gt_folder:$PWD/datasets/RealPhotoOne"
timeout 10800 python demo/train.py $G2 --noise_level 5 --method proposed \
  --ProposedLoss__sure_alternative r2r --dataset "$RP1" --epochs 3000 \
  --checkpoint_interval 1000 \
  --out_dir experiments/runs/rp1_g2_r2r 2>&1 | grep -v WARN | tail -3
cp experiments/runs/rp1_g2_r2r/training.csv "$EV/rp1_g2_r2r_training.csv" 2>/dev/null || true
# eval the single-photo-trained model on the FULL 7-photo protocol: train
# image included (the reference's single_image recipe evaluates in-sample)
# AND the 6 held-out photos measure generalization from ONE real image
ev $G2 -- experiments/runs/rp1_g2_r2r/weights.pt g2_r2r_single_photo
echo "=== queue_r5e done ==="
