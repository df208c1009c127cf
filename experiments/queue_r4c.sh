#!/bin/bash
# Round-4c TPU queue (chained after queue_r4b; VERDICT r3 item 2):
#   1. div2k G2 supervised 100-ep control (the r3 runs were wiped with the
#      VM; the parity rehearsal wants a supervised row).
#   2. Full artifact-landing parity REHEARSAL: run_parity.sh --rehearse with
#      the locally trained proposed + supervised weights — end-to-end drill
#      of the exact pipeline that fires when real Div2K + published HF
#      weights land, so the only untested thing left is the data itself.
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

echo "=== [1/2] div2k G2 supervised 100-ep control ==="
timeout 10800 python demo/train.py $G2 --noise_level 5 --method sup --bf16 \
  --dataset div2k $DD --epochs 100 \
  --out_dir experiments/runs/dl_g2_sup_100 2>&1 | grep -v WARN | tail -3

echo "=== [2/2] parity rehearsal (proposed + supervised stand-in weights) ==="
bash experiments/run_parity.sh --rehearse \
  --proposed experiments/runs/dl_g2_r2r_evalint/weights.pt \
  --supervised experiments/runs/dl_g2_sup_100/weights.pt 2>&1 \
  | grep -v WARN | tail -30 | tee "$EV/parity_rehearsal_r4.log"
cp PARITY_RESULT.md "$EV/PARITY_RESULT_rehearsal_r4.md" 2>/dev/null || true
echo "=== queue_r4c done ==="
