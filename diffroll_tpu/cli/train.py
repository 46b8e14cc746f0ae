"""Training entry: supervised / unsupervised-pretrain / pianoroll recipes.

Mirrors `train_spec_roll.py` (reference :16-59) and, with
`pretrained_path=`, the two fine-tuning entries (reference
continue_train_single.py, continue_train_both.py — select the dual-loss
recipe with `dual=true dataset2.name=MAESTRO`). Runs fit, then the test
split evaluation, like the reference's `trainer.fit` + `trainer.test`.

    python -m diffroll_tpu train spec_roll dataset.root=/data model.kernel_size=9
    python -m diffroll_tpu train unsupervised_pretrained dataset.root=/data
    python -m diffroll_tpu train pianoroll dataset.root=/data
    python -m diffroll_tpu train spec_roll pretrained_path=out/ckpt \
        model.spec_dropout=0.5                      # = continue_train_single
    python -m diffroll_tpu train spec_roll pretrained_path=out/ckpt \
        dual=true task.loss_keys=[diffusion_loss,unconditional_diffusion_loss]
"""

from __future__ import annotations

import json
import sys
from typing import List, Optional

import jax

from ..config import from_argv
from ..data.custom import DoubleDataset
from ..parallel.mesh import shard_params
from ..train import Checkpointer, TrainState, fit, make_optimizer
from ..utils.logging import MetricLogger
from . import _common
from .test import run_test


def main(argv: Optional[List[str]] = None):
    cfg, rest, overrides = from_argv(sys.argv[1:] if argv is None else argv, "spec_roll")
    dual = cfg.dual or "dual" in rest or cfg.dataset2 is not None

    if cfg.pretrained_path:
        cfg, model, task, state = _common.load_pretrained(cfg, prefer_ema=False,
                                                           overrides=overrides)
        tx = make_optimizer(_common.task_lr(cfg),
                            cfg.trainer.adam_moments_dtype)
        if cfg.trainer.adam_moments_dtype:
            # the restored opt_state carries f32 moments; packed-moment
            # fine-tuning starts the optimizer fresh (the reference's
            # load_from_checkpoint does not restore the optimizer either)
            state = TrainState(step=state.step, params=state.params,
                               opt_state=tx.init(state.params))
    else:
        model, task = _common.setup_model_task(cfg)
        tx = make_optimizer(_common.task_lr(cfg),
                            cfg.trainer.adam_moments_dtype)
        params = model.init(jax.random.key(cfg.trainer.seed))
        state = TrainState.create(params, tx)

    if dual and cfg.dataset2 is None:
        # reference continue_train_both.py:44-47 defaults: MAPS + MAESTRO
        cfg = cfg.replace(dataset2=cfg.dataset.replace(name="MAESTRO"))
    if dual:
        cfg = cfg.replace(task=cfg.task.replace(
            loss_keys=("diffusion_loss", "unconditional_diffusion_loss")))
        task = task.__class__(model, cfg.task)

    train_ds = _common.build_dataset(cfg.dataset, "train")
    if dual:
        train_ds = DoubleDataset(train_ds,
                                 _common.build_dataset(cfg.dataset2, "train"))
    try:
        val_ds = _common.build_dataset(cfg.dataset, "validation")
        val_loader = _common.build_loader(cfg, val_ds, "validation")
    except FileNotFoundError:
        val_loader = None  # MAPS has no validation split in some layouts
    train_loader = _common.build_loader(cfg, train_ds, "train")

    run_dir = _common.make_run_dir(cfg, "train")
    logger = MetricLogger(run_dir)
    from ..config.experiment import asdict_flat

    logger.log_config(asdict_flat(cfg))
    ckpt = Checkpointer(run_dir / "checkpoints",
                        max_to_keep=cfg.trainer.save_top_k)
    mesh = _common.setup_mesh(cfg)
    if mesh is not None:
        state = TrainState(step=jax.device_put(state.step),
                           params=shard_params(mesh, state.params),
                           opt_state=shard_params(mesh, state.opt_state))

    def val_hook(state, batch):
        """Render the one-step denoised rolls for the first val batch
        (the reference's validation figure grids, task/diffusion.py:643-649)."""
        import numpy as np

        from ..viz import roll_figure

        _, (_, tensors) = task.loss_fn(state.params, batch,
                                       jax.random.key(0), False)
        fig = roll_figure(np.asarray(tensors["pred_roll"]),
                          np.asarray(tensors["label_roll"]),
                          np.asarray(tensors["spec"])
                          if tensors.get("spec") is not None else None)
        logger.log_figure(int(state.step), "val/rolls", fig)
        from ..viz import param_heatmaps

        hm = param_heatmaps(state.params)
        if hm is not None:
            logger.log_figure(int(state.step), "val/trainable_params", hm)
        return {}

    print(f"run dir: {run_dir}", file=sys.stderr)
    state = fit(
        task, state, train_loader, tx,
        trainer=cfg.trainer, val_loader=val_loader, mesh=mesh,
        checkpointer=ckpt, logger=logger,
        config_record=_common.config_record(cfg),
        val_hook=val_hook,
        transfer=cfg.dataloader.transfer,
    )

    # trainer.test equivalent (reference train_spec_roll.py:59); when EMA
    # is on, evaluate the EMA weights — the same ones the standalone test
    # entry will load from this checkpoint
    if cfg.trainer.ema_decay:
        ema = ckpt.load_extra("ema", jax.eval_shape(lambda: state.params))
        if ema is not None:
            state = TrainState(step=state.step, params=ema,
                               opt_state=state.opt_state)
    try:
        metrics = run_test(cfg, model, task, state)
        (run_dir / "test_metrics.json").write_text(json.dumps(metrics, indent=2))
        print(json.dumps(metrics))
    except FileNotFoundError as e:
        print(f"skipping test split: {e}", file=sys.stderr)
    logger.close()
    return state


if __name__ == "__main__":
    main()
