"""Forward (noising) process and x0 recovery.

q_sample / extract_x0 follow the closed forms used by the reference
(reference task/diffusion.py:31-64) but broadcast over arbitrary trailing
dimensions instead of hard-coding a rank-4 layout.
"""

from __future__ import annotations

import jax.numpy as jnp

from .schedule import Schedule


def _bcast(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-example coefficients table[t] (t: (B,)) and reshape to
    (B, 1, 1, ...) so they broadcast against a rank-`ndim` batch tensor."""
    coef = table[t]
    return coef.reshape(coef.shape + (1,) * (ndim - 1))


def q_sample(
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    schedule: Schedule,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Sample x_t ~ q(x_t | x_0) (DDPM eq. 4; reference task/diffusion.py:31-46).

    x_start: (B, ...) clean rolls; t: (B,) int timesteps; noise: same shape
    as x_start.
    """
    a = _bcast(schedule.sqrt_alphas_cumprod, t, x_start.ndim)
    s = _bcast(schedule.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
    return a * x_start + s * noise


def extract_x0(
    x_t: jnp.ndarray,
    epsilon: jnp.ndarray,
    t: jnp.ndarray,
    schedule: Schedule,
) -> jnp.ndarray:
    """Recover x0 from x_t and predicted noise (inverse of DDPM eq. 4;
    reference task/diffusion.py:49-64)."""
    a = _bcast(schedule.sqrt_alphas_cumprod, t, x_t.ndim)
    s = _bcast(schedule.sqrt_one_minus_alphas_cumprod, t, x_t.ndim)
    return (x_t - s * epsilon) / a
