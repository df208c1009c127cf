#!/bin/bash
# Round-3o TPU queue: continuation after the 2026-08-18 VM re-provision cut
# queue_r3m_regen.sh during stage 3 (the sup_ep300 eval) and queue_r3n never
# started.  Runs, in order:
#   1. eval sup ep300 (finish queue_r3m stage 3)
#   2. queue_r3m stage 4: RESUME fine-tune from r2r ckp_101 (pinned lr 2e-5,
#      scheduler off — reference demo/train.py:213-230 recipe) + eval
#   3. queue_r3n: r3z + r3y probes, bench pair (defaults vs SEI_CONV_TAPS=1)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
EV=experiments/evidence

echo "=== [1/5] eval sup ep300 ==="
bash experiments/eval_parity.sh experiments/runs/dl_g2_sup_300/weights.pt sup_ep300 \
  2>&1 | tee "$EV/eval_sup_ep300.log"

echo "=== [2/5] RESUME fine-tune from r2r ckp_101, lr 2e-5 pinned, 100 epochs ==="
if [ -d experiments/runs/dl_g2_r2r_300/checkpoints/ckp_101 ]; then
  timeout 7200 python demo/train.py \
    --task deblurring --kernel Gaussian_R2 --noise_level 5 \
    --method proposed --ProposedLoss__sure_alternative r2r \
    --dataset div2k --GroundTruthDataset__datasets_dir "$PWD/datasets" \
    --epochs 201 --lr 2e-5 \
    --RESUME experiments/runs/dl_g2_r2r_300/checkpoints/ckp_101 \
    --out_dir experiments/runs/dl_g2_r2r_ft101 2>&1 | grep -v WARN | tail -3
  cp experiments/runs/dl_g2_r2r_ft101/training.csv "$EV/r2r_ft101_training.csv" 2>/dev/null || true
  bash experiments/eval_parity.sh experiments/runs/dl_g2_r2r_ft101/weights.pt r2r_ft101 \
    2>&1 | tee "$EV/eval_r2r_ft101.log"
fi

echo "=== [3/5] perf_probe_r3z ==="
timeout 2400 python experiments/perf_probe_r3z.py 2>&1 | grep -v WARN | tee "$EV/perf_probe_r3z.log"

echo "=== [4/5] perf_probe_r3y ==="
timeout 2400 python experiments/perf_probe_r3y.py 2>&1 | grep -v WARN | tee "$EV/perf_probe_r3y.log"

echo "=== [5/5] bench pair ==="
{ echo "--- defaults ---"
  timeout 1800 python bench.py 2>&1 | tail -1
  echo "--- SEI_CONV_TAPS=1 ---"
  SEI_CONV_TAPS=1 timeout 1800 python bench.py 2>&1 | tail -1
} | tee "$EV/bench_pair_r3n.log"
echo "=== queue_r3o done ==="
