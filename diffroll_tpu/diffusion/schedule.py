"""Diffusion noise schedules and precomputed coefficient tables.

Mirrors the semantics of the reference schedule math
(reference task/diffusion.py:28-64 and 237-256, model/unet.py:558-579) as
pure JAX: a `Schedule` is an immutable NamedTuple of per-timestep coefficient
tables that can be closed over by jitted functions or passed through scans.

All tables are float32 (they are tiny: T <= a few thousand scalars) and live
comfortably in SMEM/VMEM once fused into downstream kernels by XLA.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def linear_beta_schedule(beta_start: float, beta_end: float, timesteps: int) -> jnp.ndarray:
    """Linear beta schedule (reference task/diffusion.py:28-29)."""
    return jnp.linspace(beta_start, beta_end, timesteps, dtype=jnp.float32)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> jnp.ndarray:
    """Cosine schedule from Nichol & Dhariwal (reference model/unet.py:558-567)."""
    steps = timesteps + 1
    x = jnp.linspace(0.0, timesteps, steps, dtype=jnp.float32)
    alphas_cumprod = jnp.cos(((x / timesteps) + s) / (1 + s) * jnp.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return jnp.clip(betas, 0.0001, 0.9999)


def quadratic_beta_schedule(
    timesteps: int, beta_start: float = 0.0001, beta_end: float = 0.02
) -> jnp.ndarray:
    """Quadratic schedule (reference model/unet.py:570-573)."""
    return jnp.linspace(beta_start**0.5, beta_end**0.5, timesteps, dtype=jnp.float32) ** 2


def sigmoid_beta_schedule(
    timesteps: int, beta_start: float = 0.0001, beta_end: float = 0.02
) -> jnp.ndarray:
    """Sigmoid schedule (reference model/unet.py:575-579)."""
    betas = jnp.linspace(-6.0, 6.0, timesteps, dtype=jnp.float32)
    return jax.nn.sigmoid(betas) * (beta_end - beta_start) + beta_start



class Schedule(NamedTuple):
    """Precomputed DDPM coefficient tables, one scalar per timestep.

    Field names follow the quantities built in the reference constructor
    (reference task/diffusion.py:237-256) so the math is easy to audit.
    """

    betas: jnp.ndarray                          # beta_t
    alphas: jnp.ndarray                         # 1 - beta_t
    alphas_cumprod: jnp.ndarray                 # prod alpha
    alphas_cumprod_prev: jnp.ndarray            # shifted, pad 1.0
    sqrt_recip_alphas: jnp.ndarray              # 1/sqrt(alpha_t)
    sqrt_alphas_cumprod: jnp.ndarray            # sqrt(prod alpha)
    sqrt_one_minus_alphas_cumprod: jnp.ndarray  # sqrt(1 - prod alpha)
    posterior_variance: jnp.ndarray             # beta_t (1-prev)/(1-cur)

    @property
    def timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(betas: jnp.ndarray) -> Schedule:
    """Build all coefficient tables from a beta schedule."""
    betas = jnp.asarray(betas, dtype=jnp.float32)
    alphas = 1.0 - betas
    alphas_cumprod = jnp.cumprod(alphas, axis=0)
    alphas_cumprod_prev = jnp.concatenate(
        [jnp.ones((1,), dtype=jnp.float32), alphas_cumprod[:-1]]
    )
    return Schedule(
        betas=betas,
        alphas=alphas,
        alphas_cumprod=alphas_cumprod,
        alphas_cumprod_prev=alphas_cumprod_prev,
        sqrt_recip_alphas=jnp.sqrt(1.0 / alphas),
        sqrt_alphas_cumprod=jnp.sqrt(alphas_cumprod),
        sqrt_one_minus_alphas_cumprod=jnp.sqrt(1.0 - alphas_cumprod),
        posterior_variance=betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod),
    )


def linear_schedule(beta_start: float, beta_end: float, timesteps: int) -> Schedule:
    """Convenience: the schedule used by every reference config."""
    return make_schedule(linear_beta_schedule(beta_start, beta_end, timesteps))
