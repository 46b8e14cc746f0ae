"""The fit loop: epochs, validation, monitored checkpointing, logging.

TPU-native equivalent of `pl.Trainer.fit` (reference train_spec_roll.py:
54-58): one jitted sharded train step (see `step.py`) driven by a host
loop, validation every `check_val_every_n_epoch` epochs (reference
val_freq, config/spec_roll.yaml:2,38), a monitored best-checkpoint policy
(reference ModelCheckpoint monitor/save_top_k/save_last,
config/spec_roll.yaml:40-46), JSONL+TB metrics, and optional jax.profiler
traces of early steps.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.experiment import TrainerConfig
from ..data.pipeline import device_prefetch
from ..utils.logging import MetricLogger
from ..utils.profiling import StepTimer, trace_if
from .checkpoint import Checkpointer
from .state import TrainState
from .step import make_eval_step, make_train_step


def _batch_size(batch: Any) -> int:
    leaf = jax.tree_util.tree_leaves(batch)[0]
    return int(leaf.shape[0])


def _mean_losses(records) -> Dict[str, float]:
    if not records:
        return {}
    keys = records[0].keys()
    return {k: float(np.mean([float(r[k]) for r in records])) for k in keys}


def _resolve_monitor(
    monitor: str,
    train_losses: Dict[str, Any],
    val_losses: Dict[str, float],
) -> Optional[float]:
    """Look the checkpoint monitor up by its prefix: 'train/x' reads the
    last train-step losses even when a val loader exists (the
    unsupervised-pretrain recipe monitors train/diffusion_loss on MAESTRO,
    which HAS a val split — reference config/unsupervised_pretrained.yaml:
    40-46), anything else reads the epoch's mean val losses."""
    if monitor.startswith("train/"):
        key = monitor.removeprefix("train/")
        return float(train_losses[key]) if key in train_losses else None
    key = monitor.removeprefix("val/")
    return val_losses.get(key, None)


def fit(
    task,
    state: TrainState,
    train_loader: Iterable,
    tx,
    trainer: TrainerConfig = TrainerConfig(),
    val_loader: Optional[Iterable] = None,
    mesh=None,
    checkpointer: Optional[Checkpointer] = None,
    logger: Optional[MetricLogger] = None,
    config_record: Optional[Dict[str, Any]] = None,
    val_hook=None,
    transfer: str = "float32",
) -> TrainState:
    """Train to `trainer.max_epochs`. Returns the final state.

    `val_hook(state, batch) -> dict` may add extra metrics (e.g. rendered
    roll figures) on the first validation batch of each eval epoch.
    """
    step_fn = make_train_step(task.loss_fn, tx, mesh=mesh, state_example=state)
    eval_fn = make_eval_step(task.loss_fn)
    # the key's impl propagates through every split/fold_in inside the
    # step, so this single choice switches the whole training noise stream
    key = (jax.random.key(trainer.seed, impl=trainer.rng_impl)
           if trainer.rng_impl else jax.random.key(trainer.seed))

    # EMA of params (TrainerConfig.ema_decay): tracked beside the state,
    # saved as a checkpoint extra, preferred at eval time when present
    ema = None
    if trainer.ema_decay:
        # copy: the train step donates the state, deleting the original
        # param buffers an alias would point at
        ema = jax.tree_util.tree_map(jnp.copy, state.params)
        d = float(trainer.ema_decay)
        ema_update = jax.jit(
            lambda e, p: jax.tree_util.tree_map(
                lambda a, b: a * d + b * (1.0 - d), e, p),
            donate_argnums=(0,),
        )

    def ckpt_extras():
        return {"ema": ema} if ema is not None else None

    best = math.inf
    timer = StepTimer()
    global_step = int(state.step)
    losses: Dict[str, Any] = {}

    for epoch in range(trainer.max_epochs):
        with trace_if(trainer.profile and epoch == 0,
                      str(logger.run_dir / "profile") if logger else "/tmp/jax-trace"):
            # keep 2 batches in flight on device: H2D overlaps compute;
            # "packed" transfer ships int16 audio + uint8 rolls (see
            # DataloaderConfig.transfer), unpacked in-jit by loss_fn
            for batch in device_prefetch(train_loader, mesh,
                                         pack=(transfer == "packed")):
                key, step_key = jax.random.split(key)
                state, losses = step_fn(state, batch, step_key)
                if ema is not None:
                    ema = ema_update(ema, state.params)
                timer.tick(_batch_size(batch))
                global_step += 1
                if logger and global_step % trainer.log_every_n_steps == 0:
                    scalars = {f"train/{k}": v for k, v in losses.items()}
                    scalars.update(timer.rates())
                    scalars["epoch"] = epoch
                    logger.log_scalars(global_step, scalars)

        run_val = (epoch + 1) % trainer.check_val_every_n_epoch == 0
        if run_val:
            val_losses: Dict[str, float] = {}
            if val_loader is not None:
                records = []
                extra: Dict[str, float] = {}
                for i, batch in enumerate(val_loader):
                    if mesh is not None:
                        # multi-host: assemble the global val batch too, so
                        # every process sees the same monitored loss and the
                        # (collective) checkpoint save stays in sync
                        from ..parallel.mesh import shard_batch

                        batch = shard_batch(mesh, batch)
                    key, eval_key = jax.random.split(key)
                    records.append(eval_fn(state.params, batch, eval_key))
                    if i == 0 and val_hook is not None:
                        extra = val_hook(state, batch) or {}
                val_losses = _mean_losses(records)
                if logger and val_losses:
                    scalars = {f"val/{k}": v for k, v in val_losses.items()}
                    scalars.update(extra)
                    logger.log_scalars(global_step, scalars)
            monitored = _resolve_monitor(trainer.monitor, losses, val_losses)
            if monitored is None and logger is not None and (losses or val_losses):
                logger.log_scalars(global_step, {"warn/monitor_unresolved": 1.0})

            if checkpointer is not None:
                if trainer.save_last:
                    checkpointer.save_last(state, config_record,
                                           extras=ckpt_extras())
                if monitored is not None and monitored < best:
                    best = monitored
                    checkpointer.save(global_step, state, config_record,
                                      extras=ckpt_extras())

    if checkpointer is not None:
        checkpointer.save_last(state, config_record, extras=ckpt_extras())
        checkpointer.wait()
    return state
