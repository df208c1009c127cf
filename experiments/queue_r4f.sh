#!/bin/bash
# Round-4f TPU queue (chained after queue_r4e):
#   1. Re-run the parity-landing rehearsal that the previous session cut
#      short (queue_r4c step 2; the stand-in weights survived).
#   2. Real-photo SR x4 triple — completes the RealPhotos SR family
#      (x2/x3 landed in r4b; x4 is the paper's self-sup-wins setting).
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

echo "=== [1/2] parity rehearsal (proposed + supervised stand-in weights) ==="
bash experiments/run_parity.sh --rehearse \
  --proposed experiments/runs/dl_g2_r2r_evalint/weights.pt \
  --supervised experiments/runs/dl_g2_sup_100/weights.pt 2>&1 \
  | grep -v WARN | tail -30 | tee "$EV/parity_rehearsal_r4.log"
cp PARITY_RESULT.md "$EV/PARITY_RESULT_rehearsal_r4.md" 2>/dev/null || true

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
echo "=== queue_r4f done ==="
