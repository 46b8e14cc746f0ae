#!/bin/bash
# Score the full-size distilled stages + the re-trained teacher, one fresh
# process per operating point (bounds the plugin-side per-dispatch RSS
# growth). Priority order: cheapest/most-informative first so a budget or
# tunnel failure still leaves the headline rows.
# Usage: score_distilled.sh <distill_run_dir> <teacher_ckpt_dir>
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DRUN=$1
TCKPT=$2
COMMON="dataset.root=/tmp/psweep_tree model.dtype=bfloat16 \
  dataloader.test_batch_size=12 dataloader.num_workers=2 \
  trainer.output_dir=outputs/fullsize_distill_eval platform=tpu"

echo "=== distilled@5 ==="
timeout 1800 python -u -m diffroll_tpu test \
  pretrained_path=$DRUN/distilled_5steps/checkpoints \
  task.sampling_type=ddim_x0 task.sampling_steps=5 task.w=0 \
  $COMMON 2>&1 | tail -2

echo "=== teacher raw few-step ddim_x0@5 w=0 (equal-compute control) ==="
timeout 1800 python -u -m diffroll_tpu test pretrained_path=$TCKPT \
  task.sampling_type=ddim_x0 task.sampling_steps=5 task.w=0 \
  $COMMON 2>&1 | tail -2

echo "=== distilled@9 ==="
timeout 1800 python -u -m diffroll_tpu test \
  pretrained_path=$DRUN/distilled_9steps/checkpoints \
  task.sampling_type=ddim_x0 task.sampling_steps=9 task.w=0 \
  $COMMON 2>&1 | tail -2

echo "=== teacher dense cfdg_ddpm_x0@200 w=0 ==="
timeout 2400 python -u -m diffroll_tpu test pretrained_path=$TCKPT \
  task.sampling_type=cfdg_ddpm_x0 task.w=0 \
  $COMMON 2>&1 | tail -2

echo "=== distilled@17 ==="
timeout 1800 python -u -m diffroll_tpu test \
  pretrained_path=$DRUN/distilled_17steps/checkpoints \
  task.sampling_type=ddim_x0 task.sampling_steps=17 task.w=0 \
  $COMMON 2>&1 | tail -2
