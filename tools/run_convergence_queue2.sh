#!/bin/bash
# Round-5 convergence-series queue, part 2 (resume variant).
#
# The first queue invocation (run_convergence_queue.sh) completed the
# MPGNN run and reached epoch 75 of ufno_r5 before the driving session
# ended and SIGTERMed the trainer (graceful preemption checkpoint saved).
# This variant resumes ufno_r5 from its checkpoint and then runs the
# remaining family jobs.  Launch it with setsid so a session drop cannot
# preempt the queue again.
#
# Same artifact discipline: metrics JSONL/log under experiments/,
# committed with the claim; PASS/FAIL summary in /tmp/conv_queue_summary.txt.

set -u
cd "$(dirname "$0")/.."
SUM=/tmp/conv_queue_summary.txt

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

run ufno_r5_resume 5400 experiments/convergence_r5/run_resume.log \
  python train.py -C nps_tpu/configs/train/cfg_twophase_ufno.py \
  "${COMMON[@]}" --trainer.resume=true \
  --experiment_path=experiments/convergence_r5 --experiment_name=conv_ufno

run drn_r5 4200 experiments/convergence_drn/run.log \
  python train.py -C nps_tpu/configs/train/cfg_twophase_drn.py \
  "${COMMON[@]}" \
  --experiment_path=experiments/convergence_drn --experiment_name=conv_drn

run unet_r5 4200 experiments/convergence_unet/run.log \
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
run ns512 4800 experiments/convergence_ns512/run.log \
  python train.py -C nps_tpu/configs/train/cfg_ns512_ufno.py \
  --dataset.base_path=/tmp/ns512data --batch_size=2 \
  --trainer.data_parallel=false --trainer.unrolling=2 \
  --trainer.num_epochs=120 \
  --experiment_path=experiments/convergence_ns512 \
  --experiment_name=conv_ns512

echo "QUEUE2 DONE $(date +%H:%M:%S)" | tee -a "$SUM"
