#!/bin/bash
# Round-5a TPU queue — VERDICT r4 items 1+2, in priority order:
#   1. DiffPIR_DiffUNet measured row (the padding fix f67a71b is committed
#      and unit-tested; this is the third-round retry and MUST land first).
#   2. Real-photo SR x4 triple — completes the RealPhotos SR family at the
#      paper's flagship self-sup-wins setting.
# Guard: refuses to start if another queue holds the lock (ADVICE r4 item 3).
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/sei_queue.lock
if ! mkdir "$LOCK" 2>/dev/null; then
  echo "queue lock held ($LOCK) — refusing to start" >&2; exit 1
fi
trap 'rmdir "$LOCK"' EXIT
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
EV=experiments/evidence
DD="--GroundTruthDataset__datasets_dir $PWD/datasets"
G2="--task deblurring --kernel Gaussian_R2"
RP="gt_folder:$PWD/datasets/RealPhotos"
mkdir -p experiments/runs

ev() {  # ev <task/dataset-args...> -- <weights-or-kind> <tag>
  local EXTRA=()
  while [ "$1" != "--" ]; do EXTRA+=("$1"); shift; done
  shift
  local W=$1 TAG=$2
  echo "=== eval $TAG ==="
  local MARGS=(--weights "$W"); [ -f "$W" ] || MARGS=(--model_kind "$W")
  timeout 5400 python demo/test.py --noise_level 5 "${EXTRA[@]}" \
    "${MARGS[@]}" 2>&1 | grep -v WARN | tail -8 | tee "$EV/eval_${TAG}.log"
}

echo "=== [1/2] DiffPIR_DiffUNet row (padding fix f67a71b) ==="
SEI_DIFFUNET_WEIGHTS=$PWD/experiments/runs/diffunet.pt \
  timeout 5400 python demo/test.py $G2 --noise_level 5 --dataset div2k $DD \
  --model_kind DiffPIR_DiffUNet --indices 0,1,2,3,4 2>&1 | grep -v WARN \
  | tail -8 | tee "$EV/eval_diffpir_diffunet.log"

echo "=== [2/2] real-photo SR x4 triple ==="
SR="--task sr --sr_factor 4"
ev $SR --dataset "$RP" -- Upsample rp_sr4_upsample
timeout 10800 python demo/train.py $SR --noise_level 5 --method sup --bf16 \
  --dataset "$RP" --epochs 3000 --checkpoint_interval 500 \
  --out_dir experiments/runs/rp_sr4_sup 2>&1 | grep -v WARN | tail -3
cp experiments/runs/rp_sr4_sup/training.csv "$EV/rp_sr4_sup_training.csv" 2>/dev/null || true
ev $SR --dataset "$RP" -- experiments/runs/rp_sr4_sup/weights.pt rp_sr4_sup
timeout 14400 python demo/train.py $SR --noise_level 5 --method proposed \
  --ProposedLoss__sure_alternative r2r --dataset "$RP" --epochs 3000 \
  --checkpoint_interval 500 \
  --out_dir experiments/runs/rp_sr4_r2r 2>&1 | grep -v WARN | tail -3
cp experiments/runs/rp_sr4_r2r/training.csv "$EV/rp_sr4_r2r_training.csv" 2>/dev/null || true
ev $SR --dataset "$RP" -- experiments/runs/rp_sr4_r2r/weights.pt rp_sr4_r2r
echo "=== queue_r5a done ==="
