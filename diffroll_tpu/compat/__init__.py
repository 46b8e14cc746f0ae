from .torch_ckpt import (
    config_from_hparams,
    convert_state_dict,
    load_lightning,
    load_torch_checkpoint,
    plain_hparams,
    task_updates_from_hparams,
)

__all__ = [
    "convert_state_dict",
    "config_from_hparams",
    "load_lightning",
    "load_torch_checkpoint",
    "plain_hparams",
    "task_updates_from_hparams",
]
