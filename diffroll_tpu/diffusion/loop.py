"""The reverse-diffusion loop as a single `jax.lax.scan`.

The reference runs its reverse process as a Python loop with a full
device->host copy per step (reference task/diffusion.py:779-788). Here the
whole T-step process is one scan inside one jit: the trajectory (if
requested) is produced as scan outputs that stay on device until the caller
fetches them.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .schedule import Schedule

# step_fn(x, t, key) -> x_{t-1}; the model forward and any guidance mixing
# are closed over by the task layer.
StepFn = Callable[[jnp.ndarray, jnp.ndarray, jax.Array], jnp.ndarray]


def sample_loop(
    step_fn: StepFn,
    x_T: jnp.ndarray,
    timesteps: int,
    key: jax.Array,
    record_every: Optional[int] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Run the full reverse process t = T-1 .. 0.

    Args:
      step_fn: one reverse step (already bound to model params + conditioner).
      x_T: initial Gaussian noise, any shape.
      timesteps: T.
      key: PRNG key; folded per step.
      record_every: if set, also return the trajectory subsampled every k
        steps, shape (ceil(T/k), *x.shape) ordered from t=T-1 down to 0.

    Returns:
      (x_0, trajectory or None)
    """
    ts = jnp.arange(timesteps - 1, -1, -1, dtype=jnp.int32)
    keys = jax.random.split(key, timesteps)

    if record_every is None:

        def body(x, inp):
            t, k = inp
            return step_fn(x, t, k), None

        x0, _ = jax.lax.scan(body, x_T, (ts, keys))
        return x0, None

    def body(x, inp):
        t, k = inp
        x_next = step_fn(x, t, k)
        return x_next, x_next

    x0, traj = jax.lax.scan(body, x_T, (ts, keys))
    # subsample aligned to the end so the final (t=0) state is always included
    start = (timesteps - 1) % record_every
    return x0, traj[start::record_every]
