from .torch_ckpt import config_from_hparams, convert_state_dict, load_torch_checkpoint

__all__ = ["convert_state_dict", "config_from_hparams", "load_torch_checkpoint"]
