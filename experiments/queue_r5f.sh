#!/bin/bash
# Round-5f repair queue:
#   1. Re-run the RealPhotos G1 r2r adaptation — its first training crashed
#      mid-compile when an out-of-lock diagnostic run (the SEI_TRUNK_HPT=1
#      VMEM-OOM capture) disrupted the remote-compile tunnel.  (The lesson
#      is recorded in STATUS: nothing TPU-bound runs outside the lock.)
#   2. Plain-eval control for the noise2inverse weights: the 7.03 dB
#      g2_n2i row is the WRAPPER's faithful quirk (A_dagger-backprojected
#      subset sums the model never saw); the same weights evaluated plainly
#      should sit at supervised level, proving the training itself is sound.
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/sei_queue.lock
until mkdir "$LOCK" 2>/dev/null; do sleep 15; done
trap 'rmdir "$LOCK"' EXIT
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
EV=experiments/evidence
RP="gt_folder:$PWD/datasets/RealPhotos"
G1="--task deblurring --kernel Gaussian_R1"
G2="--task deblurring --kernel Gaussian_R2"

ev() {
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

echo "=== [1/2] G1 r2r adaptation (re-run after tunnel disruption) ==="
timeout 10800 python demo/train.py $G1 --noise_level 5 --method proposed \
  --ProposedLoss__sure_alternative r2r --dataset "$RP" --epochs 3000 \
  --checkpoint_interval 1000 \
  --out_dir experiments/runs/rp_g1_r2r 2>&1 | grep -v WARN | tail -3
cp experiments/runs/rp_g1_r2r/training.csv "$EV/rp_g1_r2r_training.csv" 2>/dev/null || true
ev $G1 -- experiments/runs/rp_g1_r2r/weights.pt g1_r2r_adapted

echo "=== [2/2] n2i plain-eval control ==="
ev $G2 -- experiments/runs/rp_g2_n2i/weights.pt g2_n2i_plain
echo "=== queue_r5f done ==="
