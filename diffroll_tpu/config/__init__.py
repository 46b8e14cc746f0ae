"""Experiment configuration: typed dataclass tree + dotted CLI overrides.

TPU-native replacement for the reference's Hydra/OmegaConf config system
(reference config/*.yaml, train_spec_roll.py:16). The group structure is
preserved — model / task / dataset / spec (the spec group lives inside the
model config as `model.mel`) — as are the knob names where sensible
(`task.sampling_type`, `model.spec_dropout`, `task.w`), so reference users
can map their Hydra overrides 1:1:

    reference:  python train_spec_roll.py model.args.kernel_size=9 task.sampling.w=0.5
    here:       python -m diffroll_tpu train model.kernel_size=9 task.w=0.5

Root presets mirror the reference root yamls (spec_roll,
unsupervised_pretrained, test, sampling, infer, pianoroll); YAML files with
the same dotted keys may be layered on top via `config=<path>.yaml`.
"""

from __future__ import annotations

from .experiment import (
    DataloaderConfig,
    DatasetConfig,
    ExperimentConfig,
    TrainerConfig,
)
from .overrides import apply_overrides, coerce, parse_argv
from .presets import PRESETS, compose, from_argv, load_yaml_overrides

__all__ = [
    "DataloaderConfig",
    "DatasetConfig",
    "ExperimentConfig",
    "TrainerConfig",
    "PRESETS",
    "apply_overrides",
    "coerce",
    "compose",
    "from_argv",
    "load_yaml_overrides",
    "parse_argv",
]
