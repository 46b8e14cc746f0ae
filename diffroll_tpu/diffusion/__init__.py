from .schedule import (
    Schedule,
    linear_beta_schedule,
    cosine_beta_schedule,
    quadratic_beta_schedule,
    sigmoid_beta_schedule,
    make_schedule,
)
from .forward import q_sample, extract_x0
from . import samplers
from .loop import sample_loop

__all__ = [
    "Schedule",
    "linear_beta_schedule",
    "cosine_beta_schedule",
    "quadratic_beta_schedule",
    "sigmoid_beta_schedule",
    "make_schedule",
    "q_sample",
    "extract_x0",
    "samplers",
    "sample_loop",
]
