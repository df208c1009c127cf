#!/bin/bash
# Round-4b TPU queue (VERDICT r3 items 3, 5, 6, 7, 9):
#   1. FMD executed end-to-end (the last never-run registry dataset, ref
#      src/datasets/fmd.py:22-62): Identity / supervised / proposed-r2r
#      triple on the Split_FMD stand-in tree.
#   2. An EXISTING campaign reproduced through --eval_interval (item 7):
#      div2k G2 proposed-r2r 100 ep with in-training validation every 10
#      epochs — final row comparable to the round-3 post-hoc-eval number.
#   3. DiffPIR_DiffUNet end-to-end (item 6): train a small guided-diffusion
#      UNet stand-in (exact published state_dict layout), then a measured
#      DiffPIR_DiffUNet row (ref src/models/diffpir.py:16-24).
#   4. SR x2 supervised 300-epoch control (item 5): equal-budget comparison
#      against the r3 proposed-r2r 32.61 dB @300ep row.
#   5. Real-photo SR campaign (item 9): SR x2/x3 identity/supervised-oracle/
#      proposed-r2r triples on the RealPhotos protocol (r3ab playbook).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
EV=experiments/evidence
DD="--GroundTruthDataset__datasets_dir $PWD/datasets"
G2="--task deblurring --kernel Gaussian_R2"
RP="gt_folder:$PWD/datasets/RealPhotos"
mkdir -p experiments/runs

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

echo "=== [1/5] FMD triple (Identity / sup / r2r), G2 deblurring ==="
ev $G2 --dataset fmd $DD -- Identity fmd_identity
timeout 7200 python demo/train.py $G2 --noise_level 5 --method sup --bf16 \
  --dataset fmd $DD --epochs 100 \
  --out_dir experiments/runs/fmd_sup_100 2>&1 | grep -v WARN | tail -3
ev $G2 --dataset fmd $DD -- experiments/runs/fmd_sup_100/weights.pt fmd_sup_ep100
timeout 7200 python demo/train.py $G2 --noise_level 5 --method proposed \
  --ProposedLoss__sure_alternative r2r --dataset fmd $DD --epochs 100 \
  --eval_interval 10 --eval_count 8 \
  --out_dir experiments/runs/fmd_r2r_100 2>&1 | grep -v WARN | tail -6
cp experiments/runs/fmd_r2r_100/validation.csv "$EV/fmd_r2r_validation.csv" 2>/dev/null || true
ev $G2 --dataset fmd $DD -- experiments/runs/fmd_r2r_100/weights.pt fmd_r2r_ep100

echo "=== [2/5] div2k G2 r2r 100ep reproduced through --eval_interval ==="
timeout 10800 python demo/train.py $G2 --noise_level 5 --method proposed \
  --ProposedLoss__sure_alternative r2r --dataset div2k $DD --epochs 100 \
  --eval_interval 10 --eval_count 16 \
  --out_dir experiments/runs/dl_g2_r2r_evalint 2>&1 | grep -v WARN | tail -6
cp experiments/runs/dl_g2_r2r_evalint/validation.csv "$EV/dl_g2_r2r_evalint_validation.csv" 2>/dev/null || true
ev $G2 --dataset div2k $DD -- experiments/runs/dl_g2_r2r_evalint/weights.pt dl_g2_r2r_evalint_ep100

echo "=== [3/5] DiffUNet stand-in training + DiffPIR_DiffUNet row ==="
timeout 10800 python experiments/train_diffunet.py \
  --out experiments/runs/diffunet.pt 2>&1 | grep -v WARN | tail -5 \
  | tee "$EV/diffunet_training.log"
SEI_DIFFUNET_WEIGHTS=$PWD/experiments/runs/diffunet.pt \
  timeout 5400 python demo/test.py $G2 --noise_level 5 --dataset div2k $DD \
  --model_kind DiffPIR_DiffUNet --indices 0,1,2,3,4 2>&1 | grep -v WARN \
  | tail -8 | tee "$EV/eval_diffpir_diffunet.log"

echo "=== [4/5] SR x2 supervised 300-epoch control (equal budget vs r2r@300) ==="
timeout 14400 python demo/train.py --task sr --sr_factor 2 --noise_level 5 \
  --method sup --bf16 --dataset div2k $DD --epochs 300 \
  --out_dir experiments/runs/sr2_sup_300 2>&1 | grep -v WARN | tail -3
cp experiments/runs/sr2_sup_300/training.csv "$EV/sr2_sup_300_training.csv" 2>/dev/null || true
ev --task sr --sr_factor 2 --dataset div2k $DD -- experiments/runs/sr2_sup_300/weights.pt sr2_sup_ep300

echo "=== [5/5] Real-photo SR x2/x3 campaign (r3ab playbook) ==="
python experiments/make_realphotos.py  # idempotent; survives VM wipes
for F in 2 3; do
  SR="--task sr --sr_factor $F"
  ev $SR --dataset "$RP" -- Upsample "rp_sr${F}_upsample"
  timeout 10800 python demo/train.py $SR --noise_level 5 --method sup --bf16 \
    --dataset "$RP" --epochs 3000 --checkpoint_interval 500 \
    --out_dir "experiments/runs/rp_sr${F}_sup" 2>&1 | grep -v WARN | tail -3
  cp "experiments/runs/rp_sr${F}_sup/training.csv" "$EV/rp_sr${F}_sup_training.csv" 2>/dev/null || true
  ev $SR --dataset "$RP" -- "experiments/runs/rp_sr${F}_sup/weights.pt" "rp_sr${F}_sup"
  timeout 14400 python demo/train.py $SR --noise_level 5 --method proposed \
    --ProposedLoss__sure_alternative r2r --dataset "$RP" --epochs 3000 \
    --checkpoint_interval 500 \
    --out_dir "experiments/runs/rp_sr${F}_r2r" 2>&1 | grep -v WARN | tail -3
  cp "experiments/runs/rp_sr${F}_r2r/training.csv" "$EV/rp_sr${F}_r2r_training.csv" 2>/dev/null || true
  ev $SR --dataset "$RP" -- "experiments/runs/rp_sr${F}_r2r/weights.pt" "rp_sr${F}_r2r"
done
echo "=== queue_r4b done ==="
