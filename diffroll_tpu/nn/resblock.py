"""Gated dilated-convolution residual blocks — the hot op of DiffRoll.

TPU-first re-expression of the reference's DiffWave blocks (reference
model/diffwave.py:107-234). Differences from the reference that matter:

  * channels-last layouts: 1-D blocks run on (B, T, C), 2-D blocks on
    (B, T, 88, C). XLA lowers `lax.conv_general_dilated` over these to MXU
    contractions; channels-last keeps the 128-lane axis on the channel dim.
  * unconditionality is an explicit per-sample boolean mask argument instead
    of sniffing `conditioner.mean() == -1` inside the block (reference
    model/diffwave.py:183-186) — data-independent control flow, jit-safe.
  * the conditioner projection is a SEPARATE entry point (`cond_proj`) so
    samplers can compute it ONCE per clip and reuse it across all T reverse
    steps — the reference recomputes it in every one of the 400 forwards of
    a CFG run (reference model/diffwave.py:143, inside forward).

Semantics preserved exactly: y = dilated_conv(x + t_proj) + cond_proj;
gate, filter = split(y); y = sigmoid(gate) * tanh(filter);
residual, skip = split(out_proj(y)); return (x + residual)/sqrt(2), skip.
Padding `((k-1)(d-1)+k-1)//2` (reference model/diffwave.py:124) equals
'SAME' for odd k, which is all the reference configs use.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch's kaiming_normal_ (reference model/diffwave.py:40-48) == he_normal
_conv_init = nn.initializers.he_normal()

_SQRT_HALF = 0.7071067811865476


class ResidualBlock(nn.Module):
    """1-D gated dilated residual block over (B, T, C).

    Two entry points:
      __call__(x, t_emb, cond_proj): the per-step compute. `cond_proj` is
        the already-projected conditioner (B, T, 2C) or None.
      cond_proj(cond, uncond_mask): project the raw conditioner
        (B, T, n_cond) -> (B, T, 2C), applying the unconditional
        substitution (learned `uncon_z` for trainable_z, reference
        ResidualBlockz model/diffwave.py:153-194; the fixed spec:=-1 case
        is applied upstream before projection).
    """

    residual_channels: int
    dilation: int = 1
    kernel_size: int = 3
    conditional: bool = True
    trainable_z: bool = False
    z_frames: int = 640            # uncon_z length (trainable_z only)
    dtype: object = None           # computation dtype (params stay f32)

    def setup(self):
        c = self.residual_channels
        self.diffusion_projection = nn.Dense(c, dtype=self.dtype)
        self.dilated_conv = nn.Conv(
            2 * c,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            kernel_init=_conv_init,
            dtype=self.dtype,
        )
        if self.conditional:
            self.conditioner_projection = nn.Conv(
                2 * c, (1,), kernel_init=_conv_init, dtype=self.dtype
            )
            if self.trainable_z:
                # learned unconditional embedding, (T, 2C) — reference keeps
                # (2C, 640) (model/diffwave.py:163-166, uninitialised
                # torch.empty; we use a proper normal init)
                self.uncon_z = self.param(
                    "uncon_z",
                    nn.initializers.normal(stddev=0.02),
                    (self.z_frames, 2 * c),
                )
        self.output_projection = nn.Conv(2 * c, (1,), kernel_init=_conv_init,
                                         dtype=self.dtype)

    def cond_proj(
        self,
        cond: jnp.ndarray,
        uncond_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if not self.conditional:
            raise ValueError("unconditional block has no conditioner projection")
        proj = self.conditioner_projection(cond)
        if self.trainable_z and uncond_mask is not None:
            z = self.uncon_z[: cond.shape[1]]
            proj = jnp.where(uncond_mask[:, None, None], z[None], proj)
        return proj

    def __call__(
        self,
        x: jnp.ndarray,
        t_emb: jnp.ndarray,
        cond_proj: Optional[jnp.ndarray] = None,
    ):
        step = self.diffusion_projection(t_emb)
        y = x + step[:, None, :]
        y = self.dilated_conv(y)
        if cond_proj is not None:
            y = y + cond_proj

        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)

        y = self.output_projection(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) * _SQRT_HALF, skip


class ResidualBlock2D(nn.Module):
    """2-D variant over (B, T, 88, C) with a (B, T, 88, 1) conditioner
    (reference ResidualBlockv2, model/diffwave.py:196-234). Reference layout
    is (B, C, 88, T); ours puts time then pitch then channels."""

    residual_channels: int
    dilation: int = 1
    kernel_size: int = 3
    conditional: bool = True
    dtype: object = None           # computation dtype (params stay f32)

    def setup(self):
        c = self.residual_channels
        self.diffusion_projection = nn.Dense(c, dtype=self.dtype)
        self.dilated_conv = nn.Conv(
            2 * c,
            (self.kernel_size, self.kernel_size),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            kernel_init=_conv_init,
            dtype=self.dtype,
        )
        if self.conditional:
            self.conditioner_projection = nn.Conv(
                2 * c, (1, 1), kernel_init=_conv_init, dtype=self.dtype
            )
        self.output_projection = nn.Conv(2 * c, (1, 1), kernel_init=_conv_init,
                                         dtype=self.dtype)

    def cond_proj(
        self,
        cond: jnp.ndarray,
        uncond_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        del uncond_mask  # no trainable-z variant in 2-D
        if not self.conditional:
            raise ValueError("unconditional block has no conditioner projection")
        return self.conditioner_projection(cond)

    def __call__(
        self,
        x: jnp.ndarray,
        t_emb: jnp.ndarray,
        cond_proj: Optional[jnp.ndarray] = None,
    ):
        step = self.diffusion_projection(t_emb)
        y = x + step[:, None, None, :]
        y = self.dilated_conv(y)
        if cond_proj is not None:
            y = y + cond_proj

        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)

        y = self.output_projection(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) * _SQRT_HALF, skip
