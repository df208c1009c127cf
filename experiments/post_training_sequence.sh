#!/bin/bash
# Post-proposed-run sequence (run steps MANUALLY, one at a time; the axon
# relay wedges under concurrent clients).
set -e
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

case "$1" in
supervised)
  # bf16 is safe for supervised (no SURE divergence estimator)
  SEI_FUSED_TRUNK=0 nohup bash experiments/train_watchdog.sh \
    experiments/runs/dl_g2_supervised /tmp/train_sup.log 1200 -- \
    --task deblurring --kernel Gaussian_R2 --noise_level 5 --method sup \
    --dataset div2k --GroundTruthDataset__datasets_dir /root/repo/datasets \
    --bf16 --epochs 300 > /tmp/watchdog_sup.log 2>&1 &
  echo $! > /tmp/watchdog.pid
  ;;
eval-identity)
  bash experiments/eval_parity.sh Identity unprocessed
  ;;
eval-proposed)
  bash experiments/eval_parity.sh experiments/runs/dl_g2_proposed/weights.pt proposed
  ;;
eval-supervised)
  bash experiments/eval_parity.sh experiments/runs/dl_g2_supervised/weights.pt supervised
  ;;
kernel-bench)
  timeout 590 python experiments/tpu_trunk_test.py
  ;;
kernel-bench-wch12)
  SEI_TRUNK_WCH=12 SEI_TRUNK_TCH=1152 timeout 590 python experiments/tpu_trunk_test.py
  ;;
drunet)
  nohup python experiments/train_drunet.py --steps 4000 \
    --out experiments/runs/drunet.npz > /tmp/drunet.log 2>&1 &
  echo $! > /tmp/drunet.pid
  ;;
*)
  echo "usage: $0 {supervised|eval-identity|eval-proposed|eval-supervised|kernel-bench|kernel-bench-wch12|drunet}"
  ;;
esac
