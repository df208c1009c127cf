#!/bin/bash
# Round-3r TPU queue: third task end-to-end — invert_a_tomography_like_filter
# (the reference's CT-like separable ramp physics, ref
# src/physics/ct_like_filter.py) on the dead-leaves Div2K stand-in (the real
# CT HDF5 dataset needs a network artifact; the physics is task-complete
# either way).  Rows: Identity (unprocessed), InverseFilter (exact A_dagger),
# supervised 100 ep, proposed r2r 100 ep.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
EV=experiments/evidence
DD="--dataset div2k --GroundTruthDataset__datasets_dir $PWD/datasets"
T="--task invert_a_tomography_like_filter --noise_level 5"

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

ev_ct() {  # ev_ct <weights-or-kind> <tag>
  local W=$1 TAG=$2; shift 2
  echo "=== eval $TAG ==="
  local MARGS=(--weights "$W"); [ -f "$W" ] || MARGS=(--model_kind "$W")
  timeout 5400 python demo/test.py $T $DD "${MARGS[@]}" "$@" \
    2>&1 | grep -v WARN | tail -8 | tee "$EV/eval_${TAG}.log"
}

echo "=== [1/4] CT-like supervised bf16 100 ep ==="
timeout 10800 python demo/train.py $T --method sup --bf16 $DD --epochs 100 \
  --out_dir experiments/runs/ct_sup_100 2>&1 | grep -v WARN | tail -3

echo "=== [2/4] CT-like proposed r2r f32 100 ep ==="
timeout 14400 python demo/train.py $T --method proposed \
  --ProposedLoss__sure_alternative r2r $DD --epochs 100 \
  --out_dir experiments/runs/ct_r2r_100 2>&1 | grep -v WARN | tail -3

echo "=== [3/4] CT-like baselines ==="
ev_ct Identity ct_identity
ev_ct InverseFilter ct_invfilter

echo "=== [4/4] CT-like trained evals ==="
ev_ct experiments/runs/ct_sup_100/weights.pt ct_sup_ep100
ev_ct experiments/runs/ct_r2r_100/weights.pt ct_r2r_ep100

echo "=== queue_r3r done ==="
