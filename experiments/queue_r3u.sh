#!/bin/bash
# Round-3u TPU queue: widen the task grid along the paper's own axes.
#   A. SR x4 noise 5 (paper: sup 22.7 / proposed 22.9 / bicubic 21.9 —
#      the row where self-sup matches supervised): sup bf16 100 ep,
#      proposed r2r f32 100 ep, bicubic Upsample row, evals.
#   B. deblurring Gaussian_R1 noise 5 (paper: sup 30.9 / proposed 30.3 /
#      unprocessed 26.4): sup bf16 100 ep, proposed r2r f32 100 ep,
#      Identity row, evals.
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

SR4="--task sr --sr_factor 4"
G1="--task deblurring --kernel Gaussian_R1"

echo "=== [1/8] SR x4 supervised bf16 100 ep ==="
timeout 10800 python demo/train.py $SR4 --noise_level 5 --method sup --bf16 \
  $DD --epochs 100 --out_dir experiments/runs/sr4_sup_100 2>&1 | grep -v WARN | tail -3
cp experiments/runs/sr4_sup_100/training.csv "$EV/sr4_sup_training.csv" 2>/dev/null || true

echo "=== [2/8] SR x4 proposed r2r f32 100 ep ==="
timeout 14400 python demo/train.py $SR4 --noise_level 5 --method proposed \
  --ProposedLoss__sure_alternative r2r $DD --epochs 100 \
  --out_dir experiments/runs/sr4_r2r_100 2>&1 | grep -v WARN | tail -3
cp experiments/runs/sr4_r2r_100/training.csv "$EV/sr4_r2r_training.csv" 2>/dev/null || true

echo "=== [3/8] SR x4 evals ==="
ev $SR4 -- Upsample sr4_upsample
ev $SR4 -- experiments/runs/sr4_sup_100/weights.pt sr4_sup_ep100
ev $SR4 -- experiments/runs/sr4_r2r_100/weights.pt sr4_r2r_ep100

echo "=== [4/8] deblurring Gaussian_R1 supervised bf16 100 ep ==="
timeout 10800 python demo/train.py $G1 --noise_level 5 --method sup --bf16 \
  $DD --epochs 100 --out_dir experiments/runs/dl_g1_sup_100 2>&1 | grep -v WARN | tail -3

echo "=== [5/8] deblurring Gaussian_R1 proposed r2r f32 100 ep ==="
timeout 14400 python demo/train.py $G1 --noise_level 5 --method proposed \
  --ProposedLoss__sure_alternative r2r $DD --epochs 100 \
  --out_dir experiments/runs/dl_g1_r2r_100 2>&1 | grep -v WARN | tail -3
cp experiments/runs/dl_g1_r2r_100/training.csv "$EV/dl_g1_r2r_training.csv" 2>/dev/null || true

echo "=== [6/8] Gaussian_R1 evals ==="
ev $G1 -- Identity g1_identity
ev $G1 -- experiments/runs/dl_g1_sup_100/weights.pt g1_sup_ep100
ev $G1 -- experiments/runs/dl_g1_r2r_100/weights.pt g1_r2r_ep100

echo "=== [7/8] Gaussian_R1 r2r loss-min checkpoint eval (if drifted) ==="
for CKP in experiments/runs/dl_g1_r2r_100/checkpoints/ckp_051; do
  if [ -d "$CKP" ]; then
    python experiments/ckpt_to_weights.py "$CKP" /tmp/w_g1r2r51.pt 2>&1 | tail -1
    ev $G1 -- /tmp/w_g1r2r51.pt g1_r2r_ep051
  fi
done

echo "=== [8/8] done ==="
echo "=== queue_r3u done ==="
