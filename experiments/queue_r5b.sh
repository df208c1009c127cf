#!/bin/bash
# Round-5b TPU queue (runs after queue_r5a releases the lock):
#   1. perf_probe_r5a — price the attention head-packing variants
#      (VERDICT r4 item 4; see the probe script header).
#   2. Stretch (VERDICT r4 item 8): real-photo deblurring triples for the
#      REMAINING kernel families — Gaussian_R1, Gaussian_R3 and Box_R2 —
#      completing the kernel-family story on real statistics (G2 landed in
#      r3ab).  Each = unprocessed row + self-sup r2r adaptation (trains on
#      the 7 photos' measurements only) + supervised-oracle upper bound.
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/sei_queue.lock
until mkdir "$LOCK" 2>/dev/null; do sleep 15; done
trap 'rmdir "$LOCK"' EXIT
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
EV=experiments/evidence
RP="gt_folder:$PWD/datasets/RealPhotos"
mkdir -p experiments/runs

echo "=== [1/2] attention head-packing probe ==="
bash experiments/perf_probe_r5a.sh 2>&1 | tee "$EV/perf_probe_r5a.log"

ev() {  # ev <task-args...> -- <weights-or-kind> <tag>
  local EXTRA=()
  while [ "$1" != "--" ]; do EXTRA+=("$1"); shift; done
  shift
  local W=$1 TAG=$2
  echo "=== eval $TAG ==="
  local MARGS=(--weights "$W"); [ -f "$W" ] || MARGS=(--model_kind "$W")
  timeout 5400 python demo/test.py --noise_level 5 --dataset "$RP" \
    "${EXTRA[@]}" "${MARGS[@]}" 2>&1 | grep -v WARN | tail -8 \
    | tee "$EV/eval_rp_${TAG}.log"
}

triple() {  # triple <kernel> <tag>
  local K=$1 TAG=$2
  local T="--task deblurring --kernel $K"
  ev $T -- Identity ${TAG}_identity
  timeout 10800 python demo/train.py $T --noise_level 5 --method proposed \
    --ProposedLoss__sure_alternative r2r --dataset "$RP" --epochs 3000 \
    --checkpoint_interval 1000 \
    --out_dir experiments/runs/rp_${TAG}_r2r 2>&1 | grep -v WARN | tail -3
  cp experiments/runs/rp_${TAG}_r2r/training.csv \
    "$EV/rp_${TAG}_r2r_training.csv" 2>/dev/null || true
  ev $T -- experiments/runs/rp_${TAG}_r2r/weights.pt ${TAG}_r2r_adapted
  timeout 10800 python demo/train.py $T --noise_level 5 --method sup --bf16 \
    --dataset "$RP" --epochs 3000 --checkpoint_interval 1000 \
    --out_dir experiments/runs/rp_${TAG}_sup 2>&1 | grep -v WARN | tail -3
  ev $T -- experiments/runs/rp_${TAG}_sup/weights.pt ${TAG}_sup_oracle
}

echo "=== [2/2] real-photo deblurring triples: G1, G3, Box_R2 ==="
triple Gaussian_R1 g1
triple Gaussian_R3 g3
triple Box_R2 box2
echo "=== queue_r5b done ==="
