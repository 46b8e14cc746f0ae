"""The experiment config tree (root of the config system).

Mirrors the reference's root yaml structure (reference
config/spec_roll.yaml:1-54): top-level knobs + model/task/dataset/trainer/
dataloader groups. `model` is a `DiffRollConfig` (the model + spec groups)
and `task` a `TaskConfig` — both defined next to the code they configure.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

from ..models.base import DiffRollConfig
from ..tasks.baseline import BaselineConfig
from ..tasks.diffusion import TaskConfig


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    """One dataset group entry (reference config/dataset/*.yaml)."""

    name: str = "MAPS"            # MAPS | MAESTRO | Custom
    root: str = "./datasets"
    data_type: str = "MUS"        # MAPS subset folder
    sequence_length: int = 327680
    seed: int = 42
    hop_length: int = 512
    min_midi: int = 21
    max_midi: int = 108
    sampling_rate: int = 16000
    download: bool = False
    preload: bool = False
    # decoded-audio LRU cache bound (bytes); None = unbounded. Default 8 GiB
    # keeps MAESTRO-scale corpora from exhausting host RAM.
    max_cache_bytes: Optional[int] = 8 << 30
    # eval segmentation (reference config/dataset/MAPS.yaml:15/29/44):
    # None = reference defaults (train False, val/test True); with True an
    # eval split enumerates consecutive windows covering every recording
    overlap: Optional[bool] = None
    # context overlap between consecutive eval windows (frames): windows
    # share this many frames and the eval loop crossfade-stitches them, so
    # scored frames keep temporal context at window seams. Measured on the
    # synthetic v2 corpus (tools/eval_boundary.py, 4-window recordings):
    # butted tiles cost 1.35 note-F1 points vs 32-frame stitching (note
    # 0.4807 vs 0.4942), so stitching is the default; 0 = butted tiles
    # (the r2 protocol), costs ~5% more sampler work at 640-frame windows
    eval_overlap_frames: int = 32
    # Custom-folder knobs (reference utils/custom_dataset.py ctor)
    audio_path: str = "my_audio"
    audio_ext: str = "wav"

    def replace(self, **kw) -> "DatasetConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class DataloaderConfig:
    """Per-split loader knobs (reference config/spec_roll.yaml:15-32)."""

    train_batch_size: int = 16
    val_batch_size: int = 4
    test_batch_size: int = 8
    num_workers: int = 4
    prefetch: int = 2
    shuffle: bool = True
    drop_last: bool = True        # static shapes: never retrace on a ragged tail
    # H2D batch format for training: "packed" ships int16 audio + uint8
    # rolls (lossless vs the 16-bit PCM sources / binary rasterization,
    # ~2.2x fewer bytes per step; unpacked in-jit by loss_fn) — the win is
    # proportional to how host-link-limited the setup is
    transfer: str = "float32"

    def replace(self, **kw) -> "DataloaderConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    """Execution-runtime knobs — the `pl.Trainer(**cfg.trainer)` equivalent
    (reference config/spec_roll.yaml:33-46, train_spec_roll.py:52-56)."""

    max_epochs: int = 2500
    check_val_every_n_epoch: int = 5          # reference val_freq
    monitor: str = "val/diffusion_loss"       # ModelCheckpoint monitor
    save_top_k: int = 2
    save_last: bool = True
    output_dir: str = "outputs"
    run_name: Optional[str] = None            # default: auto from hparams
    seed: int = 0
    # mesh: data axis defaults to all devices / model_axis; set data_axis
    # to use a subset of devices (batch must divide by data_axis)
    model_axis: int = 1
    data_axis: Optional[int] = None
    log_every_n_steps: int = 50
    profile: bool = False                     # jax.profiler trace of early steps
    # exponential moving average of params (no reference counterpart;
    # standard practice for diffusion-model eval quality). None = off.
    ema_decay: Optional[float] = None
    # train-step overhead experiments (opt-in; defaults measured-safe):
    # store Adam moments in bf16 with stochastic rounding (halves the
    # optimizer's HBM traffic; train/state.fused_adam_apply)
    adam_moments_dtype: Optional[str] = None
    # PRNG implementation for the training noise stream ('rbg' is faster
    # on TPU than the default threefry; key impl propagates through every
    # split/fold_in inside the step)
    rng_impl: Optional[str] = None

    def replace(self, **kw) -> "TrainerConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class ServeConfig:
    """Serving-entry knobs (`python -m diffroll_tpu serve`; no reference
    counterpart — see diffroll_tpu/serve/)."""

    host: str = "127.0.0.1"
    port: int = 8077
    max_batch: int = 8            # windows per compiled sampler batch
    max_wait_ms: float = 25.0     # micro-batching window after first job
    overlap_frames: int = 32      # window overlap for stitching
    max_body_mb: float = 64.0     # request-body cap (HTTP 413 above)
    # waveform H2D dtype: int16 halves the dominant per-batch transfer
    # (serve p50 1.758 -> 1.526 s, +28% throughput on the tunnel —
    # results/serve_profile_r5/), is clipped+dequantized in-jit, and is
    # bit-faithful for PCM16-sourced audio; float32 for exact f32 inputs.
    transfer: str = "int16"
    pipeline_depth: int = 2       # batches in flight (1 = serialized)
    # persistent XLA compilation cache: the full-size sampler compile can
    # take 5-13 min over a device tunnel; a warm restart with the cache
    # reloads it in seconds. "" disables.
    compile_cache_dir: str = "~/.cache/diffroll_tpu/xla"

    def replace(self, **kw) -> "ServeConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    """Progressive-distillation knobs (`python -m diffroll_tpu distill`;
    no reference counterpart — the reference walks all 200 steps,
    task/diffusion.py:779). Semantics in train/distill.py."""

    start_steps: int = 65        # first student's step count (teacher walks
                                 # the 2n-1 = 129-point strided grid)
    stages: int = 5              # halvings: 65 -> 33 -> 17 -> 9 -> 5
    steps_per_stage: int = 2000  # optimizer steps per stage
    lr: float = 1e-4
    w: float = 0.5               # guidance folded into stage 1 (reference
                                 # best w, visualization_master.ipynb cell 6)
    fold_guidance: bool = True
    snr_clip: float = 1.0        # SNR loss-weight floor
    snr_cap: float = 5.0         # SNR loss-weight ceiling (min-SNR-gamma);
                                 # uncapped SNR(0)~1e4 measured unstable

    def replace(self, **kw) -> "DistillConfig":
        return dataclasses.replace(self, **kw)

    def __post_init__(self):
        # the documented guarantee (later-stage teachers queried only at
        # timesteps they were trained on) needs every consecutive pair to
        # satisfy n_i == 2*n_{i+1} - 1, i.e. start_steps = 2^k + 1 for the
        # requested stage count — warn loudly when the grids fail to nest
        steps = self.stage_steps()
        broken = [(a, b) for a, b in zip(steps, steps[1:]) if a != 2 * b - 1]
        if broken:
            import warnings

            warnings.warn(
                f"distill stage grids do not nest: start_steps="
                f"{self.start_steps} gives stages {steps}, but "
                f"{broken[0][1]}-step grid is not every other point of the "
                f"{broken[0][0]}-step grid. Later-stage teachers will be "
                f"queried at timesteps they were never trained on; use "
                f"start_steps = 2^k + 1 (e.g. 65, 33, 17).",
                stacklevel=2,
            )

    def stage_steps(self):
        """Step counts per stage, halving from start_steps: n -> (n+1)//2.
        start_steps = 2^k+1 keeps every grid exactly nested (validated in
        __post_init__ — non-nesting configs warn)."""
        out, n = [], self.start_steps
        for _ in range(self.stages):
            out.append(n)
            n = (n + 1) // 2
            if n < 2:
                break
        return out


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    """Root config: everything a CLI entry needs."""

    model_name: str = "ClassifierFreeDiffRoll"
    model: DiffRollConfig = DiffRollConfig()
    # 'diffusion' -> DiffusionTask(task); 'baseline' -> BaselineTask(baseline)
    # (reference task/baseline.py's discriminative one-shot regression)
    task_type: str = "diffusion"
    task: TaskConfig = TaskConfig()
    baseline: BaselineConfig = BaselineConfig()
    dataset: DatasetConfig = DatasetConfig()
    # second dataset for the dual-loss recipe (reference continue_train_both.py)
    dataset2: Optional[DatasetConfig] = None
    dataloader: DataloaderConfig = DataloaderConfig()
    trainer: TrainerConfig = TrainerConfig()
    # checkpoint to start from (reference pretrained_path / checkpoint_path)
    pretrained_path: Optional[str] = None
    # dual-dataset fine-tuning recipe (reference continue_train_both.py)
    dual: bool = False
    # sampling entry knobs (reference config/sampling.yaml)
    num_samples: int = 16
    # eval audio artifact format: the reference saves mp3 (reference
    # task/diffusion.py:413-415). "mp3" encodes through an ffmpeg/lame
    # binary when one exists and falls back to wav otherwise.
    # "mp3" matches the reference's eval audio artifact (reference
    # task/diffusion.py:413-415); encodes via an ffmpeg/lame binary and
    # degrades to 16-bit wav when no encoder exists on the host
    audio_format: str = "mp3"
    serve: ServeConfig = ServeConfig()
    distill: DistillConfig = DistillConfig()

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)

    def describe(self) -> str:
        """Informative run name encoding key hparams, like the reference's
        TensorBoard run names (reference train_spec_roll.py:36-52)."""
        m, t = self.model, self.task
        return (
            f"{self.model_name}-{self.dataset.name}"
            f"-L{m.residual_layers}-C{m.residual_channels}-k{m.kernel_size}"
            f"-p{m.spec_dropout}-{t.training_mode}-{t.sampling_type}-w{t.w}"
        )


def asdict_flat(cfg: Any, prefix: str = "") -> Dict[str, Any]:
    """Flatten a (nested-dataclass) config into dotted keys, for logging."""
    out: Dict[str, Any] = {}
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        key = f"{prefix}{f.name}"
        if dataclasses.is_dataclass(v) and not isinstance(v, type):
            out.update(asdict_flat(v, key + "."))
        else:
            out[key] = v
    return out
