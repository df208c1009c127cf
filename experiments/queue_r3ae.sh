#!/bin/bash
# Round-3ae TPU queue: the reference's fine-tuning recipe end-to-end
# (ref demo/train.py:95-114,176-184): adapt a trained model to a new domain
# given ONLY degraded images (a directory of predictors — no ground truth).
#   1. generate predictors: degrade RealPhotos with G1 physics
#      (demo/generate_dataset.py, the reference's own tool for this)
#   2. fine-tune the dead-leaves-trained r2r G1 model on that directory:
#      conv_last-only params + weights_distance_loss + SGD (the ref recipe)
#   3. eval on the RealPhotos protocol; compare vs the 28.69 dB
#      cross-domain row (eval_rp_g1_r2r_xdomain.log)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
EV=experiments/evidence
G1="--task deblurring --kernel Gaussian_R1"
RP="gt_folder:$PWD/datasets/RealPhotos"

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

python experiments/make_realphotos.py

echo "=== [1/3] generate predictors (degrade RealPhotos, G1 + noise 5) ==="
timeout 1200 python demo/generate_dataset.py $G1 --noise_level 5 \
  datasets/RealPhotos /tmp/rp_g1_predictors 2>&1 | tail -2

echo "=== [2/3] fine-tune dl_g1_r2r on predictors (conv_last + wd-loss + SGD) ==="
timeout 7200 python demo/train.py $G1 --noise_level 5 --method proposed \
  --ProposedLoss__sure_alternative r2r --dataset /tmp/rp_g1_predictors \
  --fine_tuning --fine_tuning_params --weights_distance_loss \
  --weights experiments/runs/dl_g1_r2r_100/weights.pt --epochs 200 \
  --out_dir experiments/runs/ft_rp_g1 2>&1 | grep -v WARN | tail -3
cp experiments/runs/ft_rp_g1/training.csv "$EV/ft_rp_g1_training.csv" 2>/dev/null || true

echo "=== [3/3] eval fine-tuned model on RealPhotos ==="
timeout 5400 python demo/test.py $G1 --noise_level 5 --dataset "$RP" \
  --weights experiments/runs/ft_rp_g1/weights.pt 2>&1 | grep -v WARN | tail -8 \
  | tee "$EV/eval_rp_g1_r2r_ft.log"
echo "=== queue_r3ae done ==="
