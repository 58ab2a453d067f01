#!/bin/bash
# Round-5 convergence-series queue (VERDICT r4 items 2, 4, 5).
#
# Runs the remaining family convergence runs back-to-back on the single
# chip, each through the SHIPPED CLI with the round-5 depth-generic train
# step (one compile per family instead of ~8 ramp compiles) and
# whole-split eval batches. Artifact discipline (r4 lesson): each run
# writes its metrics JSONL/log directly under experiments/, committed in
# the same commit as the claim.
#
#   1. ufno_r5 — U-FNO 500 epochs, the wall-clock decomposition re-run
#      (target: end-to-end <= ~1.5x pure-train share vs r4's 3.7x)
#   2. drn_r5  — DRN 500 epochs (re-establish the lost r4 artifacts)
#   3. unet_r5 — UNetModern 500 epochs (same)
#   4. vart_r5 — var-t FNO 100 epochs (same)
#   5. ns512   — the stretch config trained for real on a wall budget
#
# Logs land in each experiment dir; a PASS/FAIL summary appends to
# /tmp/conv_queue_summary.txt after each job.

set -u
cd "$(dirname "$0")/.."
SUM=/tmp/conv_queue_summary.txt
: > "$SUM"

run() {
  local name=$1 tmo=$2 log=$3; shift 3
  echo "=== $name start $(date +%H:%M:%S)" | tee -a "$SUM"
  mkdir -p "$(dirname "$log")"
  timeout "$tmo" "$@" > "$log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc end $(date +%H:%M:%S)" | tee -a "$SUM"
  tail -3 "$log" | sed 's/^/    /' >> "$SUM"
}

COMMON=("--base_resolution=[251,96,64]" "--super_resolution=[251,96,64]"
        --dataset.base_path=/tmp/convdata "--dataset.c_filter=[0]"
        --model.activation=gelu_tanh --trainer.num_epochs=500
        --trainer.device=tpu --trainer.device_cache=true
        --trainer.compute_dtype=bfloat16 --trainer.eval_batch_size=20)

run ufno_r5 7200 experiments/convergence_r5/run.log \
  python train.py -C nps_tpu/configs/train/cfg_twophase_ufno.py \
  "${COMMON[@]}" \
  --experiment_path=experiments/convergence_r5 --experiment_name=conv_ufno

run drn_r5 5400 experiments/convergence_drn/run.log \
  python train.py -C nps_tpu/configs/train/cfg_twophase_drn.py \
  "${COMMON[@]}" \
  --experiment_path=experiments/convergence_drn --experiment_name=conv_drn

run unet_r5 5400 experiments/convergence_unet/run.log \
  python train.py -C nps_tpu/configs/train/cfg_twophase_unet.py \
  "${COMMON[@]}" \
  --experiment_path=experiments/convergence_unet --experiment_name=conv_unet

run vart_r5 2400 experiments/convergence_vart/run.log \
  python train.py -C nps_tpu/configs/train/cfg_var1d_fno.py \
  --dataset.base_path=/tmp/vart_data \
  --trainer.device=tpu --trainer.compute_dtype=bfloat16 \
  --experiment_path=experiments/convergence_vart --experiment_name=conv_vart

# stretch config, wall-budgeted: t_res=101 admits unroll depth <= 2
# (101 - 25 - 25d + 1 > 25); batch 2 is the measured single-chip fit
run ns512 5400 experiments/convergence_ns512/run.log \
  python train.py -C nps_tpu/configs/train/cfg_ns512_ufno.py \
  --dataset.base_path=/tmp/ns512data --batch_size=2 \
  --trainer.data_parallel=false --trainer.unrolling=2 \
  --trainer.num_epochs=120 \
  --experiment_path=experiments/convergence_ns512 \
  --experiment_name=conv_ns512

echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a "$SUM"
