"""Progressive-distillation entry: compress a trained checkpoint's sampler.

    python -m diffroll_tpu distill pretrained_path=<ckpt dir> \
        dataset.root=/data distill.stages=4 distill.steps_per_stage=2000

Each stage halves the deterministic sampler's step count (65 -> 33 -> 17
-> 9 -> 5 by default); the first stage also folds classifier-free guidance
(weight `distill.w`) into the student so every distilled model runs ONE
forward per step. No reference counterpart — the reference always walks
all 200 steps with two CFG forwards each (reference task/diffusion.py:779,
951-953).

Each stage is saved as a normal checkpoint under the run dir
(`distilled_<n>steps/checkpoints`); evaluate or serve one with

    python -m diffroll_tpu test pretrained_path=<run>/distilled_9steps/checkpoints \
        task.sampling_type=ddim_x0 task.sampling_steps=9 task.w=0
"""

from __future__ import annotations

import json
import sys
from typing import List, Optional

import jax

from ..config import from_argv
from ..data.pipeline import device_prefetch
from ..train import Checkpointer, TrainState, make_optimizer
from ..train.distill import progressive_distill
from ..parallel.mesh import shard_params
from . import _common


def main(argv: Optional[List[str]] = None):
    cfg, _, overrides = from_argv(sys.argv[1:] if argv is None else argv,
                                  "spec_roll")
    cfg, model, task, state = _common.load_pretrained(cfg, prefer_ema=True,
                                                      overrides=overrides)
    mesh = _common.setup_mesh(cfg)
    params = state.params
    if mesh is not None:
        params = shard_params(mesh, params)

    train_ds = _common.build_dataset(cfg.dataset, "train")
    loader = _common.build_loader(cfg, train_ds, "train")

    def batches():
        while True:
            got = False
            for b in loader:
                got = True
                yield b
            if not got:
                # without this an empty epoch (dataset smaller than the
                # batch size under the train loader's drop_last) spins
                # this while-loop forever instead of failing loudly
                raise RuntimeError(
                    f"train loader yielded no batches ({len(train_ds)} "
                    f"items, batch_size="
                    f"{cfg.dataloader.train_batch_size}, drop_last) — "
                    "shrink dataloader.train_batch_size or add data")

    run_dir = _common.make_run_dir(cfg, "distill")
    print(f"run dir: {run_dir}", file=sys.stderr)

    # same H2D path as the train loop (train/loop.py): keep 2 batches in
    # flight on the device, optionally packed (int16 audio / uint8 rolls,
    # ~2.2x fewer bytes over a bandwidth-limited link) — the distill
    # loss_fn unpacks in-jit
    feed = device_prefetch(batches(), mesh=mesh, size=2,
                           pack=(cfg.dataloader.transfer == "packed"))

    students = progressive_distill(
        model, task.schedule, params, feed,
        timesteps=cfg.task.timesteps, config=cfg.distill, mesh=mesh,
        log=lambda msg: print(msg, file=sys.stderr),
    )

    tx = make_optimizer(cfg.distill.lr)
    for n, p in students.items():
        # distilled models sample unguided (guidance is folded in) on the
        # deterministic grid they were trained for
        stage_cfg = cfg.replace(task=cfg.task.replace(
            sampling_type="ddim_x0", sampling_steps=n, w=0.0))
        ckpt = Checkpointer(run_dir / f"distilled_{n}steps" / "checkpoints")
        ckpt.save_last(TrainState.create(p, tx),
                       config=_common.config_record(stage_cfg))
        # block until orbax's async commit finishes: exiting with saves
        # in flight races interpreter shutdown ("cannot schedule new
        # futures") and can leave a stage checkpoint uncommitted
        ckpt.wait()
    print(json.dumps({
        "run_dir": str(run_dir),
        "stages": sorted(students, reverse=True),
        "eval_with": "task.sampling_type=ddim_x0 task.sampling_steps=<n> task.w=0",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main() or 0)
