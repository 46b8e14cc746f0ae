"""Model registry: reference model names -> TPU-native configs.

Presets mirror the reference's `config/model/*.yaml` argument sets so that
`models.build("ClassifierFreeDiffRoll")` gives the same architecture the
reference would instantiate via `getattr(Model, cfg.model.name)`
(reference train_spec_roll.py:29).
"""

from __future__ import annotations

from typing import Optional

from .base import DiffRollConfig, DiffRollModel, param_count
from .conditioning import (
    apply_inpainting_mask,
    compute_spec,
    spec_dropout_mask,
    trim_to,
)

# Defaults per reference config/model/*.yaml. kernel_size / dilation defaults
# follow the ctor defaults where the yaml omits them (model/diffwave.py:283-295,
# 579-595, 347-358).
PRESETS = {
    # config/model/ClassifierFreeDiffRoll.yaml
    "ClassifierFreeDiffRoll": DiffRollConfig(
        name="ClassifierFreeDiffRoll",
        residual_channels=512, residual_layers=15, kernel_size=3,
        dilation_base=2, dilation_bound=4, condition="fixed",
        spec_dropout=0.1, norm_args=(0.0, 1.0, "imagewise"), spec_norm="unit",
    ),
    # config/model/DiffRoll.yaml (norm_args comes from task/diffusion.yaml)
    "DiffRoll": DiffRollConfig(
        name="DiffRoll",
        residual_channels=512, residual_layers=15, kernel_size=3,
        dilation_base=1, dilation_bound=4, condition="fixed",
        spec_dropout=0.0, norm_args=(0.0, 1.0, "imagewise"),
        spec_norm="norm_args", timesteps=500,
    ),
    # config/model/DiffRollBaseline.yaml (one-shot discriminative baseline)
    "DiffRollBaseline": DiffRollConfig(
        name="DiffRollBaseline",
        residual_channels=512, residual_layers=15, kernel_size=7,
        dilation_base=1, dilation_bound=1, condition="fixed",
        spec_dropout=0.0, norm_args=(-1.0, 1.0, "imagewise"),
        spec_norm="norm_args",
    ),
    # config/model/DiffRollDebug.yaml — ground-truth roll as conditioner
    "DiffRollDebug": DiffRollConfig(
        name="DiffRollDebug", cond_source="roll",
        residual_channels=256, residual_layers=30, kernel_size=3,
        dilation_base=1, dilation_bound=4, n_mels=88,
        spec_dropout=0.0, norm_args=(0.0, 1.0, "imagewise"), timesteps=500,
    ),
    # config/model/DiffRollv2.yaml — 2-D conv variant, raw log-mel cond
    "DiffRollv2": DiffRollConfig(
        name="DiffRollv2", variant="2d",
        residual_channels=16, residual_layers=30, kernel_size=3,
        dilation_base=1, dilation_bound=10,
        spec_dropout=0.0, norm_args=(0.0, 1.0, "imagewise"),
        spec_norm="none", timesteps=500,
    ),
    # config/model/DiffRollv2Debug.yaml
    "DiffRollv2Debug": DiffRollConfig(
        name="DiffRollv2Debug", variant="2d", cond_source="roll",
        residual_channels=32, residual_layers=30, kernel_size=3,
        dilation_base=1, dilation_bound=10,
        spec_dropout=0.0, norm_args=(0.0, 1.0, "imagewise"), timesteps=500,
    ),
    # config/model/Unet.yaml — unconditional roll U-Net (RollDiffusion task,
    # trained on RAW rolls: reference task/diffusion.py:96-100)
    "Unet": DiffRollConfig(
        name="Unet", variant="unet", cond_source="none", unconditional=True,
        residual_channels=28, dim_mults=(1, 2, 4),
        spec_dropout=0.0, norm_args=(0.0, 1.0, "none"), timesteps=200,
    ),
    # config/model/SpecUnet.yaml — spec-conditioned U-Net, raw log-mel cond
    "SpecUnet": DiffRollConfig(
        name="SpecUnet", variant="spec_unet", cond_source="spec",
        residual_channels=28, dim_mults=(1, 2, 4),
        spec_dropout=0.0, norm_args=(0.0, 1.0, "none"), spec_norm="none",
        timesteps=200,
    ),
}


def build(name: str, **overrides) -> DiffRollModel:
    """Instantiate a registered model, with config overrides
    (the equivalent of Hydra `model.args.*=` CLI overrides)."""
    if name not in PRESETS:
        raise KeyError(f"unknown model {name!r}; choices: {sorted(PRESETS)}")
    return DiffRollModel(PRESETS[name].replace(**overrides))


__all__ = [
    "DiffRollConfig",
    "DiffRollModel",
    "PRESETS",
    "build",
    "param_count",
    "compute_spec",
    "spec_dropout_mask",
    "apply_inpainting_mask",
    "trim_to",
]
