#!/bin/bash
# Full-size (512x15) guided progressive distillation on the chip.
# Teacher: outputs/fullsize_tpu_packed/2026-08-19/23-54-38 (note F1 scored run).
cd /root/repo
RUN=outputs/fullsize_tpu_packed/2026-08-19/23-54-38/train-ClassifierFreeDiffRoll-MAPS-L15-C512-k3-p0.1-x_0-cfdg_ddpm_x0-w0.0
export PYTHONPATH=/root/repo:/root/.axon_site
exec python -u -m diffroll_tpu distill \
  pretrained_path=$RUN/checkpoints \
  dataset.root=/tmp/psweep_tree \
  model.dtype=bfloat16 \
  dataloader.num_workers=2 dataloader.transfer=packed \
  distill.start_steps=17 distill.stages=3 distill.steps_per_stage=1000 \
  distill.w=0 \
  trainer.output_dir=outputs/fullsize_distill platform=tpu
