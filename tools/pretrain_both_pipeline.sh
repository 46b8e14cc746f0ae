#!/bin/bash
# The paper's flagship recipe end-to-end on the synthetic v2 corpus:
#   stage 1: unconditional pretrain (spec_dropout p=1) on a LARGER unpaired
#            tree  (reference: pretrain on MAESTRO, config/unsupervised_pretrained.yaml)
#   stage 2: retrain-Both — dual loss (conditional on the paired tree +
#            always-unconditional on the unpaired tree), p=0.1
#            (reference continue_train_both.py:44-47)
#   stage 3: eval-side w-sweep of the retrained model
#            (reference visualization_master.ipynb cell 6 `data5`:
#             74.0 / 74.7 / 77.0 / 76.6 / 74.8 / 60.8 at w=0..4)
#   stage 4: guided progressive distillation of the retrained flagship,
#            then score the distilled operating points
#
# Usage: tools/pretrain_both_pipeline.sh [smoke]
#   smoke — tiny corpus/model/steps to validate every command end-to-end
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"

SMOKE="${1:-}"
if [ "$SMOKE" = "smoke" ]; then
  PAIRED=/tmp/smoke_paired; UNPAIRED=/tmp/smoke_unpaired
  OUT=outputs/pretrain_both_smoke
  N1=8; N1T=2; N2=8; N2T=2  # >= train batch 8: drop_last would starve distill
  MODEL="model.residual_channels=8 model.residual_layers=2 task.timesteps=4
         model.frames=64 dataset.sequence_length=32768"
  SEQ2=32768
  EP_PRE=1; EP_RT=1; VAL=1
  WGRID='w_grid=[0.0,0.5]'
  DSTEPS=200; DSTART=2; DSTAGES=1  # 2-step student fits T=4's 3-point grid
else
  PAIRED=/tmp/psweep_tree; UNPAIRED=/tmp/pretrain_tree
  OUT=outputs/pretrain_both_cpu
  N1=192; N1T=12; N2=384; N2T=2
  # the results/psweep_synthetic_v2 geometry, so supervised rows compare 1:1
  MODEL="model.residual_channels=128 model.residual_layers=8 task.timesteps=100
         model.frames=128 dataset.sequence_length=65536"
  SEQ2=65536
  EP_PRE=84; EP_RT=84; VAL=28   # 384/bs8*84 = 4032 pretrain steps; 2016 retrain
  WGRID='w_grid=[0.0,0.1,0.5,1.0,1.5,4.0]'
  DSTEPS=1000; DSTART=17; DSTAGES=3
fi
COMMON="platform=cpu task.lr=4e-4 dataloader.train_batch_size=8
        dataloader.test_batch_size=8 dataloader.num_workers=2"

echo "=== corpora ==="
[ -d "$PAIRED/MAPS" ] || python tools/make_synthetic_tree.py out=$PAIRED \
    n_train=$N1 n_test=$N1T seconds=20.48
[ -d "$UNPAIRED/MAPS" ] || python tools/make_synthetic_tree.py out=$UNPAIRED \
    n_train=$N2 n_test=$N2T seconds=20.48 seed=7

echo "=== stage 1: unconditional pretrain (p=1) on the unpaired tree ==="
# dataset.name=MAPS: the synthetic unpaired tree is MAPS-layout (the preset's
# MAESTRO default needs the official metadata json/csv for its split)
python -u -m diffroll_tpu train unsupervised_pretrained \
    dataset.name=MAPS dataset.root=$UNPAIRED $MODEL $COMMON \
    trainer.max_epochs=$EP_PRE trainer.check_val_every_n_epoch=$VAL \
    trainer.output_dir=$OUT/pretrain
CKPT_PRE=$(find $OUT/pretrain -type d -name checkpoints | sort | tail -1)
echo "pretrain ckpt: $CKPT_PRE"

echo "=== stage 2: retrain-Both (dual loss, p=0.1) ==="
python -u -m diffroll_tpu train spec_roll dual=true \
    pretrained_path=$CKPT_PRE model.spec_dropout=0.1 \
    dataset.root=$PAIRED dataset2.name=MAPS dataset2.root=$UNPAIRED \
    dataset2.sequence_length=$SEQ2 $MODEL $COMMON \
    trainer.max_epochs=$EP_RT trainer.check_val_every_n_epoch=$VAL \
    trainer.output_dir=$OUT/retrain_both
CKPT_BOTH=$(find $OUT/retrain_both -type d -name checkpoints | sort | tail -1)
echo "retrain ckpt: $CKPT_BOTH"

echo "=== stage 3: w-sweep the retrained model ==="
python -u -m diffroll_tpu sweep pretrained_path=$CKPT_BOTH \
    "$WGRID" 'threshold_grid=[0.5]' \
    dataset.root=$PAIRED dataset.sequence_length=$SEQ2 $COMMON \
    trainer.output_dir=$OUT/wsweep

echo "=== stage 4: distill the retrained flagship (guidance w=0.5 folded) ==="
python -u -m diffroll_tpu distill pretrained_path=$CKPT_BOTH \
    dataset.root=$PAIRED $MODEL $COMMON \
    distill.start_steps=$DSTART distill.stages=$DSTAGES \
    distill.steps_per_stage=$DSTEPS distill.w=0.5 \
    trainer.output_dir=$OUT/distill
DRUN=$(dirname "$(find $OUT/distill -type d -name 'distilled_*steps' | sort | tail -1)")
for D in "$DRUN"/distilled_*steps; do
  N=$(basename "$D" | sed 's/distilled_\([0-9]*\)steps/\1/')
  echo "=== scoring distilled@$N ==="
  python -u -m diffroll_tpu test pretrained_path="$D/checkpoints" \
      task.sampling_type=ddim_x0 task.sampling_steps=$N task.w=0 \
      dataset.root=$PAIRED dataset.sequence_length=$SEQ2 $COMMON \
      trainer.output_dir=$OUT/distill_eval_$N
done

echo "=== pipeline complete ==="
