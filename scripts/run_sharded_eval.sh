#!/bin/bash
# Embarrassingly-parallel eval sharding — the reference's per-GPU
# convention (ref evaluation/mevis_val_u/run_inference_mevis.sh,
# evaluation/videoinfer/run_inference_parallel.sh: 8 processes striding
# the job list by `i % subset_num == subset_idx`). On TPU the unit is a
# HOST (one process per chip/host); results land in the shared out dir
# and the eval stage merges by files, exactly like the reference.
#
#   bash scripts/run_sharded_eval.sh <num_shards> <eval-cmd...>
#
#   bash scripts/run_sharded_eval.sh 8 \
#     python scripts/eval_vos.py --stage infer --benchmark mevis \
#       --data_root /data/mevis --split valid_u --out_dir out/mevis \
#       --model_dir ckpts/unigr-7b
#
# The command must accept --subset_idx/--subset_num (eval_vos,
# eval_videoinfer, eval_region_qa, eval_img all do). Every shard's
# output is idempotent-resumable, so rerunning after a crash only
# fills the gaps (ref README convention: "run step 1 again").
set -eu
N=$1; shift
pids=()
for i in $(seq 0 $((N - 1))); do
  "$@" --subset_idx "$i" --subset_num "$N" &
  pids+=($!)
done
rc=0
for p in "${pids[@]}"; do
  wait "$p" || rc=$?
done
exit $rc
