"""Training runtime: state, sharded steps, checkpointing."""

from .checkpoint import Checkpointer
from .distill import DistillConfig, distill_stage, progressive_distill
from .loop import fit
from .state import TrainState, make_optimizer
from .step import make_eval_step, make_train_step

__all__ = [
    "TrainState",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
    "Checkpointer",
    "fit",
    "DistillConfig",
    "distill_stage",
    "progressive_distill",
]
