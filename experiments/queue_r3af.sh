#!/bin/bash
# Round-3af TPU queue:
#   1. ei-rotate+shift method row (the 4th and last ProposedLoss transform
#      group, ref src/losses/__init__.py:86-90) — completes the dispatch
#      table with measured numbers for every group.
#   2. urban100 at the reference's FULL 4000-epoch budget (ref
#      demo/train.py:131-141: urban100 trains 4000 epochs, ckpt cadence
#      400) — full-budget recipe parity + a long-horizon drift check.
#   3. SR x2 proposed r2r extended to 300 epochs (the x2 gap was the widest
#      SR row at 100 ep; the lr decay only starts at epochs/2).
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

ev() {  # ev <extra-args...> -- <weights-or-kind> <tag>
  local EXTRA=()
  while [ "$1" != "--" ]; do EXTRA+=("$1"); shift; done
  shift
  local W=$1 TAG=$2
  echo "=== eval $TAG ==="
  local MARGS=(--weights "$W"); [ -f "$W" ] || MARGS=(--model_kind "$W")
  timeout 5400 python demo/test.py --noise_level 5 "${EXTRA[@]}" \
    "${MARGS[@]}" 2>&1 | grep -v WARN | tail -8 | tee "$EV/eval_${TAG}.log"
}

echo "=== [1/3] ei-rotate+shift row (r2r, 100 ep) ==="
timeout 7200 python demo/train.py $G2 --noise_level 5 --method proposed \
  --ProposedLoss__transforms "Rotations+Shifts" \
  --ProposedLoss__sure_alternative r2r --dataset div2k $DD --epochs 100 \
  --out_dir experiments/runs/dl_g2_eirs_100 2>&1 | grep -v WARN | tail -3
ev $G2 --dataset div2k $DD -- experiments/runs/dl_g2_eirs_100/weights.pt eirs_ep100

echo "=== [2/3] urban100 r2r at the reference's FULL 4000-epoch budget ==="
timeout 28800 python demo/train.py $G2 --noise_level 5 --method proposed \
  --ProposedLoss__sure_alternative r2r --dataset urban100 $DD --epochs 4000 \
  --out_dir experiments/runs/u100_r2r_4000 2>&1 | grep -v WARN | tail -3
cp experiments/runs/u100_r2r_4000/training.csv "$EV/u100_r2r_4000_training.csv" 2>/dev/null || true
ev $G2 --dataset urban100 $DD -- experiments/runs/u100_r2r_4000/weights.pt u100_r2r_ep4000
# loss-min checkpoint too, if the trajectory drifted
for CKP in experiments/runs/u100_r2r_4000/checkpoints/ckp_0801 \
           experiments/runs/u100_r2r_4000/checkpoints/ckp_1601; do
  if [ -d "$CKP" ]; then
    E=$(basename "$CKP" | sed 's/ckp_//')
    python experiments/ckpt_to_weights.py "$CKP" "/tmp/w_u100_$E.pt" 2>&1 | tail -1
    ev $G2 --dataset urban100 $DD -- "/tmp/w_u100_$E.pt" "u100_r2r_ep$E"
  fi
done

echo "=== [3/3] SR x2 r2r extended to 300 epochs ==="
timeout 14400 python demo/train.py --task sr --sr_factor 2 --noise_level 5 \
  --method proposed --ProposedLoss__sure_alternative r2r --dataset div2k $DD \
  --epochs 300 --out_dir experiments/runs/sr2_r2r_300 2>&1 | grep -v WARN | tail -3
cp experiments/runs/sr2_r2r_300/training.csv "$EV/sr2_r2r_300_training.csv" 2>/dev/null || true
ev --task sr --sr_factor 2 --dataset div2k $DD -- experiments/runs/sr2_r2r_300/weights.pt sr2_r2r_ep300
echo "=== queue_r3af done ==="
