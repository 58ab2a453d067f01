#!/bin/bash
# Resume the wall-budgeted ns512 stretch run with the round-5 bf16
# train-split device cache (cfg_ns512_ufno defaults device_cache_scope
# ="train", device_cache_dtype="bfloat16"): kills the ~212 MB/batch H2D
# tax that held the uncached leg to ~142 s/epoch. Fallback if the cache
# OOMs: rerun with --trainer.device_cache=false --trainer.num_epochs=45.
set -u
cd "$(dirname "$0")/.."
SUM=/tmp/conv_queue_summary.txt
echo "=== ns512_resume_cached start $(date +%H:%M:%S)" | tee -a "$SUM"
timeout "${1:-6600}" python train.py -C nps_tpu/configs/train/cfg_ns512_ufno.py \
  --dataset.base_path=/tmp/ns512data --batch_size=2 \
  --trainer.data_parallel=false --trainer.unrolling=2 \
  --trainer.num_epochs="${2:-120}" --trainer.device_cache=true \
  --experiment_path=experiments/convergence_ns512 \
  --experiment_name=conv_ns512 \
  > experiments/convergence_ns512/run_resume.log 2>&1
rc=$?
echo "=== ns512_resume_cached rc=$rc end $(date +%H:%M:%S)" | tee -a "$SUM"
tail -3 experiments/convergence_ns512/run_resume.log | sed 's/^/    /' >> "$SUM"
