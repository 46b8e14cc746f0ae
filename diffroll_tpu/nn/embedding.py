"""Diffusion timestep embedding.

Re-implements the DiffWave-style timestep embedding used by every DiffRoll
variant (reference model/diffwave.py:58-88): a precomputed 128-dim sin/cos
table over `max_steps` with geometric frequencies 10^(4 d / 63), followed by
two Dense(512) + SiLU projections. Integer timesteps index the table
directly; float timesteps linearly interpolate between adjacent rows (used
by fractional-step samplers).

The table is a compile-time constant (T x 128 floats), so under jit XLA
bakes it into the program and the per-step cost is two tiny matmuls.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _build_table(max_steps: int, dim: int) -> np.ndarray:
    """Sin/cos table, shape (max_steps, dim). dim must be even."""
    half = dim // 2
    steps = np.arange(max_steps, dtype=np.float64)[:, None]        # (T, 1)
    freqs = 10.0 ** (np.arange(half, dtype=np.float64)[None, :] * 4.0 / (half - 1))
    angles = steps * freqs                                          # (T, half)
    table = np.concatenate([np.sin(angles), np.cos(angles)], axis=1)
    return table.astype(np.float32)


class DiffusionEmbedding(nn.Module):
    """t (B,) int or float -> embedding (B, proj_dim)."""

    max_steps: int
    dim: int = 128
    proj_dim: int = 512

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        table = jnp.asarray(_build_table(self.max_steps, self.dim))
        if jnp.issubdtype(t.dtype, jnp.integer):
            x = table[t]
        else:
            # fractional timestep: lerp between floor and ceil rows
            low = jnp.floor(t).astype(jnp.int32)
            high = jnp.ceil(t).astype(jnp.int32)
            frac = (t - low.astype(t.dtype))[..., None]
            x = table[low] + (table[high] - table[low]) * frac
        x = nn.Dense(self.proj_dim, name="projection1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.proj_dim, name="projection2")(x)
        x = nn.silu(x)
        return x
