"""Shared CLI plumbing: dataset/loader/model construction, run dirs,
checkpoint load-with-override."""

from __future__ import annotations

import pathlib
import time
from typing import Any, Dict, Optional, Tuple

import jax

from .. import models
from ..config.experiment import DatasetConfig, ExperimentConfig
from ..data.amt import MAESTRO, MAPS
from ..data.custom import Custom
from ..data.pipeline import DataLoader
from ..parallel.mesh import make_mesh, shard_params
from ..tasks.diffusion import DiffusionTask
from ..train.checkpoint import Checkpointer
from ..train.state import TrainState, make_optimizer
from ..utils.logging import MetricLogger


def build_dataset(ds: DatasetConfig, split: str):
    """split in {'train', 'validation', 'test'} (reference groups knob)."""
    overlap = ds.overlap
    if overlap is None:
        # reference defaults: random train windows; eval splits enumerate
        # consecutive windows covering each recording (MAPS.yaml:15/29/44)
        overlap = split != "train"
    common = dict(
        sequence_length=ds.sequence_length, seed=ds.seed,
        hop_length=ds.hop_length, min_midi=ds.min_midi, max_midi=ds.max_midi,
        sampling_rate=ds.sampling_rate, preload=ds.preload, overlap=overlap,
        eval_overlap_frames=ds.eval_overlap_frames,
        max_cache_bytes=ds.max_cache_bytes,
    )
    if ds.name == "MAPS":
        groups = "train" if split in ("train", "validation") else "test"
        return MAPS(ds.root, groups=groups, data_type=ds.data_type,
                    download=ds.download, **common)
    if ds.name == "MAESTRO":
        return MAESTRO(ds.root, groups=split, download=ds.download, **common)
    if ds.name == "Custom":
        return Custom(ds.audio_path, ds.audio_ext,
                      max_segment_samples=ds.sequence_length,
                      sample_rate=ds.sampling_rate)
    raise KeyError(f"unknown dataset {ds.name!r}")


def build_loader(cfg: ExperimentConfig, dataset, split: str) -> DataLoader:
    dl = cfg.dataloader
    bs = {"train": dl.train_batch_size, "validation": dl.val_batch_size,
          "test": dl.test_batch_size}[split]
    return DataLoader(
        dataset, bs,
        shuffle=dl.shuffle and split == "train",
        drop_last=dl.drop_last and split == "train",
        num_workers=dl.num_workers, prefetch=dl.prefetch,
        seed=cfg.trainer.seed,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )


def task_lr(cfg: ExperimentConfig) -> float:
    return cfg.baseline.lr if cfg.task_type == "baseline" else cfg.task.lr


def task_threshold(cfg: ExperimentConfig) -> float:
    """The eval binarization threshold (the baseline task uses its own —
    reference config/task/baseline.yaml frame_threshold 0.6)."""
    return (cfg.baseline.frame_threshold if cfg.task_type == "baseline"
            else cfg.task.frame_threshold)


def make_run_dir(cfg: ExperimentConfig, kind: str) -> pathlib.Path:
    """outputs/<date>/<run-name> — the Hydra-run-dir equivalent
    (reference README.md:50)."""
    name = cfg.trainer.run_name or cfg.describe()
    stamp = time.strftime("%Y-%m-%d/%H-%M-%S")
    run_dir = pathlib.Path(cfg.trainer.output_dir) / stamp / f"{kind}-{name}"
    run_dir.mkdir(parents=True, exist_ok=True)
    return run_dir


def setup_model_task(cfg: ExperimentConfig):
    model = models.DiffRollModel(cfg.model)
    if cfg.task_type == "baseline":
        from ..tasks.baseline import BaselineTask

        return model, BaselineTask(model, cfg.baseline)
    return model, DiffusionTask(model, cfg.task)


def config_record(cfg: ExperimentConfig) -> Dict[str, Any]:
    return {"model_name": cfg.model_name, "model": cfg.model,
            "task": cfg.task, "task_type": cfg.task_type,
            "baseline": cfg.baseline}


def load_pretrained(
    cfg: ExperimentConfig,
    prefer_ema: bool = True,
    overrides: Optional[Dict[str, Any]] = None,
) -> Tuple[ExperimentConfig, Any, DiffusionTask, TrainState]:
    """Restore a checkpoint with the reference's "reload weights, override
    hparams" semantic (reference load_from_checkpoint + overrides,
    continue_train_single.py:36-37, test.py:29-36): the stored model config
    wins for architecture, the CLI config wins for task/sampling knobs, and
    the user's explicit `model.*` CLI keys are re-applied on top of the
    stored config (e.g. model.spec_dropout when switching pretrain ->
    fine-tune, reference continue_train_single.py).
    """
    if not cfg.pretrained_path:
        raise SystemExit("pretrained_path=<checkpoint dir> is required")
    if pathlib.Path(cfg.pretrained_path).suffix == ".ckpt":
        # a PyTorch-Lightning file (e.g. a published Zenodo checkpoint,
        # reference README.md:110): convert in place so
        # `python -m diffroll_tpu test pretrained_path=x.ckpt` is the
        # complete one-command parity recipe
        return _load_lightning_pretrained(cfg, overrides)
    ckpt = Checkpointer(cfg.pretrained_path)
    stored = ckpt.peek_config()
    model_cfg = stored.get("model", cfg.model)
    model_over = {k[len("model."):]: v for k, v in (overrides or {}).items()
                  if k.startswith("model.")}
    if model_over:
        from ..config import apply_overrides

        model_cfg = apply_overrides(model_cfg, model_over)
    # architecture comes from the ckpt; sampling-time knobs (timesteps must
    # match the embedding table) stay compatible with the stored net
    cfg = cfg.replace(
        model=model_cfg,
        model_name=stored.get("model_name", cfg.model_name),
        task_type=stored.get("task_type", cfg.task_type),
        task=cfg.task.replace(timesteps=model_cfg.timesteps),
    )
    model, task = setup_model_task(cfg)
    tx = make_optimizer(task_lr(cfg))
    abstract = jax.eval_shape(
        lambda k: TrainState.create(model.init(k), tx), jax.random.key(0)
    )
    state, _ = ckpt.load(abstract)
    # EMA weights (TrainerConfig.ema_decay runs) are preferred for eval;
    # fine-tuning continues from the raw weights (prefer_ema=False)
    if prefer_ema:
        ema = ckpt.load_extra("ema", abstract.params)
        if ema is not None:
            state = TrainState(step=state.step, params=ema,
                               opt_state=state.opt_state)
    return cfg, model, task, state


def _load_lightning_pretrained(
    cfg: ExperimentConfig,
    overrides: Optional[Dict[str, Any]] = None,
) -> Tuple[ExperimentConfig, Any, DiffusionTask, TrainState]:
    """`pretrained_path=<file>.ckpt`: convert a Lightning checkpoint and
    adopt its hparams with the same precedence as the orbax path —
    architecture + recorded task knobs from the checkpoint, explicit CLI
    dotted overrides on top (reference test.py:29-36 ladder)."""
    from ..compat import load_lightning
    from ..config import apply_overrides

    model_cfg, task_updates, params = load_lightning(
        cfg.pretrained_path, cfg.model_name)
    over = overrides or {}
    model_over = {k[len("model."):]: v for k, v in over.items()
                  if k.startswith("model.")}
    if model_over:
        model_cfg = apply_overrides(model_cfg, model_over)
    # recorded task knobs (sampler, thresholds, schedule) apply first;
    # the user's explicit task.* keys win — timesteps always follows the
    # model's embedding table
    task_updates = {k: v for k, v in task_updates.items()
                    if f"task.{k}" not in over}
    task_cfg = cfg.task.replace(**task_updates)
    task_cfg = task_cfg.replace(timesteps=model_cfg.timesteps)
    cfg = cfg.replace(model=model_cfg, task=task_cfg)
    model, task = setup_model_task(cfg)
    tx = make_optimizer(task_lr(cfg))

    # converted trees must match a fresh init leaf-for-leaf — catch layout
    # or scale mismatches here, not as a cryptic apply-time error
    expect = jax.eval_shape(model.init, jax.random.key(0))
    got = {p: l.shape for p, l in
           jax.tree_util.tree_leaves_with_path(params)}
    want = {p: l.shape for p, l in
            jax.tree_util.tree_leaves_with_path(expect)}
    if got != want:
        missing = sorted(set(map(jax.tree_util.keystr, set(want) - set(got))))
        extra = sorted(set(map(jax.tree_util.keystr, set(got) - set(want))))
        shapes = [f"{jax.tree_util.keystr(p)}: {got[p]} != {want[p]}"
                  for p in set(got) & set(want) if got[p] != want[p]]
        raise SystemExit(
            "converted checkpoint does not match the model architecture\n"
            + "\n".join(f"  missing: {m}" for m in missing)
            + "\n".join(f"  extra: {e}" for e in extra)
            + "\n".join(f"  shape {s}" for s in shapes))
    params = jax.tree_util.tree_map(
        lambda l, s: l.astype(s.dtype), params, expect)
    state = TrainState.create(params, tx)
    return cfg, model, task, state


def setup_mesh(cfg: ExperimentConfig):
    t = cfg.trainer
    if jax.device_count() == 1 and t.model_axis == 1:
        return None
    data = t.data_axis
    if data is None:
        data = jax.device_count() // t.model_axis
        # don't shard the batch finer than it can split
        data = max(1, min(data, cfg.dataloader.train_batch_size))
        while cfg.dataloader.train_batch_size % data:
            data -= 1
    devices = jax.devices()[: data * t.model_axis]
    return make_mesh(data=data, model=t.model_axis, devices=devices)
