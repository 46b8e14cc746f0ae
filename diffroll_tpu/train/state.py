"""Train state: params + optimizer state + step counter (flax.struct)."""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation) -> "TrainState":
        import jax.numpy as jnp

        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


def make_optimizer(lr: float) -> optax.GradientTransformation:
    """Adam with the reference's settings (torch.optim.Adam(lr), reference
    task/diffusion.py:1057-1067: default betas/eps, no weight decay)."""
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
