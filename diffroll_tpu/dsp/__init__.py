from .normalize import Normalization, min_max_normalize
from .mel import MelSpectrogram, MelConfig, log_mel

__all__ = ["Normalization", "min_max_normalize", "MelSpectrogram", "MelConfig", "log_mel"]
