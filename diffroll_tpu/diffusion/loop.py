"""The reverse-diffusion loop as a single `jax.lax.scan`.

The reference runs its reverse process as a Python loop with a full
device->host copy per step (reference task/diffusion.py:779-788). Here the
whole T-step process is one scan inside one jit: the trajectory (if
requested) is produced as scan outputs that stay on device until the caller
fetches them.

Beyond the reference, the loop can run a strided SUBSEQUENCE of timesteps
(`steps=N`): the step functions take an explicit `t_prev` (the next
timestep visited, -1 at the end), which generalizes DDPM/DDIM updates to
arbitrary jumps — 20-50 DDIM steps reach near-200-step quality at a
fraction of the latency.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# step_fn(x, t, t_prev, key) -> x_{t_prev}; the model forward and any
# guidance mixing are closed over by the task layer. t_prev == -1 marks the
# final step (produce x_0).
StepFn = Callable[
    [jnp.ndarray, jnp.ndarray, jnp.ndarray, jax.Array], jnp.ndarray
]


def timestep_subsequence(timesteps: int, steps: Optional[int]) -> np.ndarray:
    """Descending timestep indices: all of T-1..0, or `steps` evenly spaced
    values including both T-1 and 0."""
    if steps is None or steps >= timesteps:
        return np.arange(timesteps - 1, -1, -1, dtype=np.int32)
    if steps < 1:
        raise ValueError("steps must be >= 1")
    ts = np.unique(np.round(np.linspace(0, timesteps - 1, steps)).astype(np.int32))
    return ts[::-1]


def sample_loop(
    step_fn: StepFn,
    x_T: jnp.ndarray,
    timesteps: int,
    key: jax.Array,
    record_every: Optional[int] = None,
    steps: Optional[int] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Run the reverse process over t = T-1 .. 0 (or a strided subsequence).

    Args:
      step_fn: one reverse step (already bound to model params + conditioner).
      x_T: initial Gaussian noise, any shape.
      timesteps: T.
      key: PRNG key; folded per step.
      record_every: if set, also return the trajectory subsampled every k
        visited steps, ordered from t=T-1 down to 0 (last state included).
      steps: if set, visit only `steps` evenly spaced timesteps.

    Returns:
      (x_0, trajectory or None)
    """
    ts_np = timestep_subsequence(timesteps, steps)
    ts = jnp.asarray(ts_np)
    ts_prev = jnp.asarray(np.concatenate([ts_np[1:], [-1]]).astype(np.int32))
    n = len(ts_np)
    keys = jax.random.split(key, n)

    if record_every is None:

        def body(x, inp):
            t, tp, k = inp
            return step_fn(x, t, tp, k), None

        x0, _ = jax.lax.scan(body, x_T, (ts, ts_prev, keys))
        return x0, None

    def body(x, inp):
        t, tp, k = inp
        x_next = step_fn(x, t, tp, k)
        return x_next, x_next

    x0, traj = jax.lax.scan(body, x_T, (ts, ts_prev, keys))
    # subsample aligned to the end so the final (t=0) state is always included
    start = (n - 1) % record_every
    return x0, traj[start::record_every]
