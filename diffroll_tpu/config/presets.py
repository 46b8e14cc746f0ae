"""Root experiment presets + composition.

One preset per reference root yaml (reference config/{spec_roll,
unsupervised_pretrained, test, sampling, infer, pianoroll}.yaml), each
composing the model / task / dataset groups exactly as the reference's
`defaults:` lists do. `compose(name, overrides)` is the Hydra-main
equivalent; `from_argv` wires it to a CLI.
"""

from __future__ import annotations

import pathlib
from typing import Any, Dict, List, Optional, Tuple

import yaml

from ..models import PRESETS as MODEL_PRESETS
from ..tasks.diffusion import TaskConfig
from .experiment import (
    DataloaderConfig,
    DatasetConfig,
    ExperimentConfig,
    TrainerConfig,
)
from .overrides import apply_overrides, parse_argv


def _base(model_name: str, **model_kw) -> ExperimentConfig:
    model = MODEL_PRESETS[model_name].replace(**model_kw)
    return ExperimentConfig(
        model_name=model_name,
        model=model,
        task=TaskConfig(timesteps=model.timesteps),
    )


# reference config/spec_roll.yaml: supervised training on MAPS,
# ClassifierFreeDiffRoll, x_0 objective, lr 5e-5, 200 timesteps
_SPEC_ROLL = _base("ClassifierFreeDiffRoll").replace(
    task=TaskConfig(
        timesteps=200, training_mode="x_0", loss_type="l2", lr=5e-5,
        sampling_type="cfdg_ddpm_x0", w=0.0, frame_threshold=0.5,
    ),
    dataset=DatasetConfig(name="MAPS"),
    trainer=TrainerConfig(max_epochs=2500, check_val_every_n_epoch=5,
                          monitor="val/diffusion_loss"),
)

# reference config/unsupervised_pretrained.yaml: p=1 spec dropout pretrain
# on MAESTRO; no val loop worth monitoring -> monitor the train loss
_UNSUP = _SPEC_ROLL.replace(
    model=_SPEC_ROLL.model.replace(spec_dropout=1.0),
    dataset=DatasetConfig(name="MAESTRO"),
    trainer=_SPEC_ROLL.trainer.replace(monitor="train/diffusion_loss"),
)

# reference config/test.yaml: eval a checkpoint with CFG sampling w=0.5
_TEST = _SPEC_ROLL.replace(
    task=_SPEC_ROLL.task.replace(sampling_type="cfdg_ddpm_x0", w=0.5),
)

# reference config/sampling.yaml: transcription / inpainting / generation
# from noise over a folder of user audio
_SAMPLING = _SPEC_ROLL.replace(
    task=_SPEC_ROLL.task.replace(sampling_type="cfdg_ddpm_x0", w=0.5,
                                 generation_filter=0.1),
    dataset=DatasetConfig(name="Custom", audio_path="my_audio",
                          audio_ext="mp3"),
    num_samples=16,
)

# reference config/pianoroll.yaml + infer.yaml: unconditional U-Net over
# raw rolls (RollDiffusion task: epsilon objective, huber loss, lr 1e-5,
# 200 timesteps, 200 epochs)
_PIANOROLL = _base("Unet").replace(
    task=TaskConfig(timesteps=200, training_mode="epsilon", loss_type="huber",
                    lr=1e-5, sampling_type="ddpm"),
    dataset=DatasetConfig(name="MAESTRO"),
    trainer=TrainerConfig(max_epochs=200, monitor="val/diffusion_loss"),
)
_INFER = _PIANOROLL

# reference config/task/baseline.yaml + config/model/DiffRollBaseline.yaml:
# discriminative one-shot spec->roll regression (k=7, no dilation)
_BASELINE = _SPEC_ROLL.replace(
    model_name="DiffRollBaseline",
    model=MODEL_PRESETS["DiffRollBaseline"],
    task_type="baseline",
    trainer=_SPEC_ROLL.trainer.replace(monitor="val/amt_loss"),
)

PRESETS: Dict[str, ExperimentConfig] = {
    "spec_roll": _SPEC_ROLL,
    "baseline": _BASELINE,
    "unsupervised_pretrained": _UNSUP,
    "test": _TEST,
    "sampling": _SAMPLING,
    "pianoroll": _PIANOROLL,
    "infer": _INFER,
}


def load_yaml_overrides(path: str | pathlib.Path) -> Dict[str, Any]:
    """Flatten a YAML mapping into dotted override keys."""
    raw = yaml.safe_load(pathlib.Path(path).read_text()) or {}

    def flatten(d: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k, v in d.items():
            key = f"{prefix}{k}"
            if isinstance(v, dict):
                out.update(flatten(v, key + "."))
            else:
                out[key] = v
        return out

    return flatten(raw)


def compose(
    name: str = "spec_roll",
    overrides: Optional[Dict[str, Any]] = None,
) -> ExperimentConfig:
    """Resolve a preset and apply dotted overrides (the @hydra.main
    equivalent, reference train_spec_roll.py:16)."""
    if name not in PRESETS:
        raise KeyError(f"unknown config {name!r}; choices: {sorted(PRESETS)}")
    cfg = PRESETS[name]
    overrides = dict(overrides or {})

    # model swap re-composes the model group, preserving later overrides
    model_name = overrides.pop("model_name", None)
    if model_name is not None:
        cfg = cfg.replace(model_name=model_name,
                          model=MODEL_PRESETS[model_name])

    # `config=<file>.yaml` layers a YAML file under the CLI overrides
    yaml_path = overrides.pop("config", None)
    if yaml_path is not None:
        file_overrides = load_yaml_overrides(yaml_path)
        file_overrides.update(overrides)
        overrides = file_overrides

    cfg = apply_overrides(cfg, overrides)
    # keep the model's embedding table in step with the task's T
    if cfg.model.timesteps != cfg.task.timesteps:
        cfg = cfg.replace(model=cfg.model.replace(timesteps=cfg.task.timesteps))
    return cfg


def from_argv(
    argv: List[str], default: str,
) -> Tuple[ExperimentConfig, List[str], Dict[str, Any]]:
    """Build a config from CLI argv: positional tokens + key=value overrides.

    The first positional token, if any, selects the root preset. Returns
    (config, remaining positionals, raw overrides) — the raw overrides let
    checkpoint loaders re-apply the USER's explicit keys on top of a stored
    config (the reference's load_from_checkpoint(**overrides) semantics).
    """
    positional, overrides = parse_argv(argv)
    name = positional[0] if positional and positional[0] in PRESETS else default
    rest = positional[1:] if positional and positional[0] in PRESETS else positional
    cfg = compose(name, dict(overrides))
    # the returned overrides must reflect EVERY key the user explicitly
    # pinned — including keys layered from a `config=<file>.yaml` — or the
    # checkpoint loaders would clobber file-specified values with stored
    # ones (CLI keys still win over file keys on conflict)
    yaml_path = overrides.get("config")
    if yaml_path is not None:
        merged = load_yaml_overrides(yaml_path)
        merged.update(overrides)
        overrides = merged
    return cfg, rest, overrides
