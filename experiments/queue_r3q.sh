#!/bin/bash
# Round-3q TPU queue: breadth campaign — second task (SR x2) end-to-end plus
# method and baseline rows on deblurring, so the results table covers the
# reference's full method/model surface at realistic scale.
#   A. SR x2 noise 5: smoke (2 ep), supervised bf16 100 ep, proposed r2r
#      f32 100 ep, evals + bicubic Upsample baseline row
#   B. deblurring method rows: css (bf16), ei-rotate (r2r variant, f32),
#      sure (f32, eval at ckp_051 = its stable horizon)
#   C. deblurring baseline rows: TV, DIP, InverseFilter (5 imgs), BM3D (2)
# Every stage tolerates failure (logs and moves on).  One TPU client at a
# time: chained via WAIT_PID behind the bench triple.
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

ev_deblur() {  # ev_deblur <weights-or-kind> <tag> [extra args...]
  local W=$1 TAG=$2; shift 2
  echo "=== eval $TAG ==="
  local MARGS=(--weights "$W"); [ -f "$W" ] || [ -d "$W" ] || MARGS=(--model_kind "$W")
  timeout 5400 python demo/test.py --task deblurring --kernel Gaussian_R2 \
    --noise_level 5 $DD "${MARGS[@]}" "$@" 2>&1 | grep -v WARN | tail -8 \
    | tee "$EV/eval_${TAG}.log"
}

ev_sr() {  # ev_sr <weights-or-kind> <tag> [extra args...]
  local W=$1 TAG=$2; shift 2
  echo "=== eval $TAG ==="
  local MARGS=(--weights "$W"); [ -f "$W" ] || [ -d "$W" ] || MARGS=(--model_kind "$W")
  timeout 5400 python demo/test.py --task sr --sr_factor 2 \
    --noise_level 5 $DD "${MARGS[@]}" "$@" 2>&1 | grep -v WARN | tail -8 \
    | tee "$EV/eval_${TAG}.log"
}

echo "=== [1/10] SR smoke (proposed r2r, 2 epochs) ==="
timeout 3600 python demo/train.py --task sr --sr_factor 2 --noise_level 5 \
  --method proposed --ProposedLoss__sure_alternative r2r $DD --epochs 2 \
  --out_dir /tmp/sr_smoke 2>&1 | grep -v WARN | tail -3

echo "=== [2/10] SR supervised bf16 100 ep ==="
timeout 10800 python demo/train.py --task sr --sr_factor 2 --noise_level 5 \
  --method sup --bf16 $DD --epochs 100 \
  --out_dir experiments/runs/sr2_sup_100 2>&1 | grep -v WARN | tail -3
cp experiments/runs/sr2_sup_100/training.csv "$EV/sr2_sup_training.csv" 2>/dev/null || true

echo "=== [3/10] SR proposed r2r f32 100 ep ==="
timeout 14400 python demo/train.py --task sr --sr_factor 2 --noise_level 5 \
  --method proposed --ProposedLoss__sure_alternative r2r $DD --epochs 100 \
  --out_dir experiments/runs/sr2_r2r_100 2>&1 | grep -v WARN | tail -3
cp experiments/runs/sr2_r2r_100/training.csv "$EV/sr2_r2r_training.csv" 2>/dev/null || true

echo "=== [4/10] SR evals ==="
ev_sr Upsample sr2_upsample
ev_sr experiments/runs/sr2_sup_100/weights.pt sr2_sup_ep100
ev_sr experiments/runs/sr2_r2r_100/weights.pt sr2_r2r_ep100

echo "=== [5/10] deblurring css bf16 100 ep + eval ==="
timeout 10800 python demo/train.py --task deblurring --kernel Gaussian_R2 \
  --noise_level 5 --method css --bf16 $DD --epochs 100 \
  --out_dir experiments/runs/dl_g2_css_100 2>&1 | grep -v WARN | tail -3
ev_deblur experiments/runs/dl_g2_css_100/weights.pt css_ep100

echo "=== [6/10] deblurring ei-rotate (r2r) f32 100 ep + eval ==="
timeout 14400 python demo/train.py --task deblurring --kernel Gaussian_R2 \
  --noise_level 5 --method ei-rotate --ProposedLoss__sure_alternative r2r \
  $DD --epochs 100 \
  --out_dir experiments/runs/dl_g2_eirot_100 2>&1 | grep -v WARN | tail -3
ev_deblur experiments/runs/dl_g2_eirot_100/weights.pt eirot_ep100

echo "=== [7/10] deblurring sure f32 100 ep + eval at ckp_051 ==="
timeout 14400 python demo/train.py --task deblurring --kernel Gaussian_R2 \
  --noise_level 5 --method sure $DD --epochs 100 \
  --out_dir experiments/runs/dl_g2_sure_100 2>&1 | grep -v WARN | tail -3
if [ -d experiments/runs/dl_g2_sure_100/checkpoints/ckp_051 ]; then
  python experiments/ckpt_to_weights.py \
    experiments/runs/dl_g2_sure_100/checkpoints/ckp_051 /tmp/w_sure51.pt 2>&1 | tail -1
  ev_deblur /tmp/w_sure51.pt sure_ep051
fi
ev_deblur experiments/runs/dl_g2_sure_100/weights.pt sure_ep100

echo "=== [8/10] TV + InverseFilter rows (5 imgs) ==="
ev_deblur TV tv_5imgs --indices 0,1,2,3,4
ev_deblur InverseFilter invfilter_5imgs --indices 0,1,2,3,4

echo "=== [9/10] DIP row (5 imgs) ==="
ev_deblur DeepImagePrior dip_5imgs --indices 0,1,2,3,4

echo "=== [10/10] BM3D row (2 imgs) ==="
ev_deblur BM3D bm3d_2imgs --indices 0,1

echo "=== queue_r3q done ==="
