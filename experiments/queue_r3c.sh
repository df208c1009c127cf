#!/bin/bash
# Round-3c TPU queue: runs after the 500-epoch r2r proposed run releases
# the chip (single axon client at a time).
#   1. bench triple: conv_mm on (default) / conv_mm off / fused-trunk off
#      (VERDICT items 1 + 10: headline number and the auditable deltas)
#   2. eval the finished 500-epoch r2r proposed checkpoint (item 5)
#   3. wide-sigma DRUNet retrain + DPS / DiffPIR re-eval (item 6 follow-up)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

echo "=== bench: conv_mm ON (default) ==="
timeout 2400 python bench.py 2>&1 | grep -v WARN | tail -2
echo "=== bench: conv_mm OFF ==="
SEI_CONV_MM=0 timeout 2400 python bench.py 2>&1 | grep -v WARN | tail -2
echo "=== bench: fused trunk OFF (conv_mm ON) ==="
SEI_FUSED_TRUNK=0 timeout 2400 python bench.py 2>&1 | grep -v WARN | tail -2

echo "=== eval r2r_500 ==="
if [ -f experiments/runs/dl_g2_r2r_500/weights.pt ]; then
  bash experiments/eval_parity.sh experiments/runs/dl_g2_r2r_500/weights.pt r2r_500 \
    2>&1 | tee experiments/evidence/eval_r2r_500.log
else
  echo "r2r_500 weights.pt missing - run unfinished?" | tee experiments/evidence/eval_r2r_500.log
  ls experiments/runs/dl_g2_r2r_500/
fi

echo "=== wide-sigma drunet retrain ==="
timeout 3600 python experiments/train_drunet.py --steps 6000 \
  --sigma_dist log --sigma_max 80.0 \
  --out experiments/runs/drunet_wide.npz 2>&1 | grep -v WARN | tail -12

echo "=== DPS with wide drunet ==="
SEI_DRUNET_WEIGHTS=$PWD/experiments/runs/drunet_wide.npz \
  bash experiments/eval_denoiser_baselines.sh dps 5 \
  2>&1 | tee experiments/evidence/eval_dps_wide.log
echo "=== DiffPIR with wide drunet ==="
SEI_DRUNET_WEIGHTS=$PWD/experiments/runs/drunet_wide.npz \
  bash experiments/eval_denoiser_baselines.sh diffpir 5 \
  2>&1 | tee experiments/evidence/eval_diffpir_wide.log
echo "=== queue_r3c done ==="
