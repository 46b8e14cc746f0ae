"""Gated dilated-convolution residual blocks — the hot op of DiffRoll.

TPU-first re-expression of the reference's DiffWave blocks (reference
model/diffwave.py:107-234). Differences from the reference that matter:

  * channels-last layouts: 1-D blocks run on (B, T, C), 2-D blocks on
    (B, T, 88, C). XLA lowers `lax.conv_general_dilated` over these to MXU
    contractions; channels-last keeps the 128-lane axis on the channel dim.
  * unconditionality is an explicit per-sample boolean mask argument instead
    of sniffing `conditioner.mean() == -1` inside the block (reference
    model/diffwave.py:183-186) — data-independent control flow, jit-safe.
  * no in-place mutation: `jnp.where` selects between the conditioner
    projection and the learned unconditional embedding.

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

    Args to __call__:
      x: (B, T, C) hidden state.
      t_emb: (B, 512) diffusion-step embedding.
      cond: (B, T, n_cond) conditioner (log-mel spec, or roll for debug
        models), or None for a fully unconditional block.
      uncond_mask: (B,) bool; True rows use the learned `uncon_z` embedding
        instead of the projected conditioner. Only meaningful when
        `trainable_z=True` (reference ResidualBlockz, model/diffwave.py:153-194).
    """

    residual_channels: int
    dilation: int = 1
    kernel_size: int = 3
    conditional: bool = True
    trainable_z: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t_emb: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
        uncond_mask: Optional[jnp.ndarray] = None,
    ):
        c = self.residual_channels
        step = nn.Dense(c, name="diffusion_projection")(t_emb)
        y = x + step[:, None, :]
        y = nn.Conv(
            2 * c,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            kernel_init=_conv_init,
            name="dilated_conv",
        )(y)

        if self.conditional:
            if cond is None:
                raise ValueError("conditional block requires a conditioner")
            proj = nn.Conv(
                2 * c, (1,), kernel_init=_conv_init, name="conditioner_projection"
            )(cond)
            if self.trainable_z:
                # learned unconditional embedding, (T, 2C) — reference keeps
                # (2C, 640) (model/diffwave.py:163-166, uninitialised
                # torch.empty; we use a proper normal init)
                z = self.param(
                    "uncon_z",
                    nn.initializers.normal(stddev=0.02),
                    (cond.shape[1], 2 * c),
                )
                if uncond_mask is not None:
                    proj = jnp.where(uncond_mask[:, None, None], z[None], proj)
            y = y + proj

        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)

        y = nn.Conv(2 * c, (1,), kernel_init=_conv_init, name="output_projection")(y)
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

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t_emb: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
        uncond_mask: Optional[jnp.ndarray] = None,
    ):
        del uncond_mask  # no trainable-z variant in 2-D
        c = self.residual_channels
        step = nn.Dense(c, name="diffusion_projection")(t_emb)
        y = x + step[:, None, None, :]
        y = nn.Conv(
            2 * c,
            (self.kernel_size, self.kernel_size),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            kernel_init=_conv_init,
            name="dilated_conv",
        )(y)
        if self.conditional:
            if cond is None:
                raise ValueError("conditional block requires a conditioner")
            proj = nn.Conv(
                2 * c, (1, 1), kernel_init=_conv_init, name="conditioner_projection"
            )(cond)
            y = y + proj

        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)

        y = nn.Conv(2 * c, (1, 1), kernel_init=_conv_init, name="output_projection")(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) * _SQRT_HALF, skip
