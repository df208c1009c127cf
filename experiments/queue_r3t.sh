#!/bin/bash
# Round-3t TPU queue: the last method/wrapper combinations end-to-end.
#   1. noise2inverse on the CT-like task: train --method noise2inverse
#      (measurement-split supervised pairs) then eval with the
#      --noise2inverse K-subset ensemble wrapper (ref demo/test.py:116-124).
#   2. the --r2r eval-time ensemble wrapper (N noise-perturbed forwards,
#      ref demo/test.py:126-133) on the deblurring r2r ep101 weights.
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

echo "=== [1/3] CT-like noise2inverse train 100 ep ==="
timeout 10800 python demo/train.py --task invert_a_tomography_like_filter \
  --noise_level 5 --method noise2inverse --bf16 $DD --epochs 100 \
  --out_dir experiments/runs/ct_n2i_100 2>&1 | grep -v WARN | tail -3

echo "=== [2/3] CT-like n2i eval (ensemble wrapper) ==="
timeout 5400 python demo/test.py --task invert_a_tomography_like_filter \
  --noise_level 5 $DD --weights experiments/runs/ct_n2i_100/weights.pt \
  --noise2inverse 2>&1 | grep -v WARN | tail -8 | tee "$EV/eval_ct_n2i_ep100.log"

echo "=== [3/3] deblurring --r2r ensemble eval on r2r ep101 weights ==="
W=experiments/runs/dl_g2_r2r_300/checkpoints
if [ -d "$W/ckp_101" ]; then
  python experiments/ckpt_to_weights.py "$W/ckp_101" /tmp/w_r2r101.pt 2>&1 | tail -1
  timeout 5400 python demo/test.py --task deblurring --kernel Gaussian_R2 \
    --noise_level 5 $DD --weights /tmp/w_r2r101.pt --r2r \
    2>&1 | grep -v WARN | tail -8 | tee "$EV/eval_r2r_wrapper_ep101.log"
else
  echo "ckp_101 missing; skipping" | tee "$EV/eval_r2r_wrapper_ep101.log"
fi
echo "=== queue_r3t done ==="
