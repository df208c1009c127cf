#!/bin/bash
# Round-3aa TPU queue: complete the paper's 6-setting grid
# (ref assets/Reconstruction_Performance.png — README.md:14-22).
# Already measured: Gaussian_R1 (r3w), Gaussian_R2 (r3l/q), SR x2 (r3q),
# SR x4 (r3u), Box_R2 (r3w, in flight).  Missing: Gaussian_R3 and SR x3.
#   A. deblurring Gaussian_R3 noise 5 (paper: sup 23.6 / proposed 23.5 /
#      unprocessed 21.2): sup bf16 100 ep, proposed r2r f32 100 ep, evals
#      incl. the loss-min checkpoint if the strong-blur EI regime drifts.
#   B. SR x3 noise 5 (paper: sup 24.3 / proposed 24.4 / bicubic 23.3 —
#      the second row where self-sup matches supervised).
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

G3="--task deblurring --kernel Gaussian_R3"
SR3="--task sr --sr_factor 3"

echo "=== [1/8] deblurring Gaussian_R3 supervised bf16 100 ep ==="
timeout 10800 python demo/train.py $G3 --noise_level 5 --method sup --bf16 \
  $DD --epochs 100 --out_dir experiments/runs/dl_g3_sup_100 2>&1 | grep -v WARN | tail -3

echo "=== [2/8] deblurring Gaussian_R3 proposed r2r f32 100 ep ==="
timeout 14400 python demo/train.py $G3 --noise_level 5 --method proposed \
  --ProposedLoss__sure_alternative r2r $DD --epochs 100 \
  --out_dir experiments/runs/dl_g3_r2r_100 2>&1 | grep -v WARN | tail -3
cp experiments/runs/dl_g3_r2r_100/training.csv "$EV/dl_g3_r2r_training.csv" 2>/dev/null || true

echo "=== [3/8] Gaussian_R3 evals ==="
ev $G3 -- Identity g3_identity
ev $G3 -- experiments/runs/dl_g3_sup_100/weights.pt g3_sup_ep100
ev $G3 -- experiments/runs/dl_g3_r2r_100/weights.pt g3_r2r_ep100

echo "=== [4/8] Gaussian_R3 r2r loss-min checkpoint eval (if drifted) ==="
for CKP in experiments/runs/dl_g3_r2r_100/checkpoints/ckp_051; do
  if [ -d "$CKP" ]; then
    python experiments/ckpt_to_weights.py "$CKP" /tmp/w_g3r2r51.pt 2>&1 | tail -1
    ev $G3 -- /tmp/w_g3r2r51.pt g3_r2r_ep051
  fi
done

echo "=== [5/8] SR x3 supervised bf16 100 ep ==="
timeout 10800 python demo/train.py $SR3 --noise_level 5 --method sup --bf16 \
  $DD --epochs 100 --out_dir experiments/runs/sr3_sup_100 2>&1 | grep -v WARN | tail -3
cp experiments/runs/sr3_sup_100/training.csv "$EV/sr3_sup_training.csv" 2>/dev/null || true

echo "=== [6/8] SR x3 proposed r2r f32 100 ep ==="
timeout 14400 python demo/train.py $SR3 --noise_level 5 --method proposed \
  --ProposedLoss__sure_alternative r2r $DD --epochs 100 \
  --out_dir experiments/runs/sr3_r2r_100 2>&1 | grep -v WARN | tail -3
cp experiments/runs/sr3_r2r_100/training.csv "$EV/sr3_r2r_training.csv" 2>/dev/null || true

echo "=== [7/8] SR x3 evals ==="
ev $SR3 -- Upsample sr3_upsample
ev $SR3 -- experiments/runs/sr3_sup_100/weights.pt sr3_sup_ep100
ev $SR3 -- experiments/runs/sr3_r2r_100/weights.pt sr3_r2r_ep100

echo "=== [8/8] done ==="
echo "=== queue_r3aa done ==="
