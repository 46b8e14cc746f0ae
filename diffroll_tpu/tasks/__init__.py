"""Task layer: diffusion / baseline training + sampling orchestration."""

from .baseline import BaselineConfig, BaselineTask
from .diffusion import DiffusionTask, TaskConfig
from .losses import p_losses

__all__ = [
    "DiffusionTask",
    "TaskConfig",
    "BaselineTask",
    "BaselineConfig",
    "p_losses",
]
