"""Neural network building blocks (flax.linen, channels-last layouts)."""

from .embedding import DiffusionEmbedding
from .resblock import ResidualBlock, ResidualBlock2D
from .denoiser import DiffRollNet, DiffRollNet2D

__all__ = [
    "DiffusionEmbedding",
    "ResidualBlock",
    "ResidualBlock2D",
    "DiffRollNet",
    "DiffRollNet2D",
]
