from .gated_stack import GatedStackWeights, gated_stack, gated_stack_xla, stack_weights
from .gated_stack_grad import gated_stack_trainable
from .fused_forward import fused_forward, supports_fused

__all__ = [
    "GatedStackWeights",
    "gated_stack",
    "gated_stack_xla",
    "gated_stack_trainable",
    "stack_weights",
    "fused_forward",
    "supports_fused",
]
