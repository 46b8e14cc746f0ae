"""DiffWave audio vocoder net (vestigial parity).

The reference vendors the original LMNT DiffWave audio-synthesis network
with its spectrogram upsampler (reference model/diffwave.py:91-104,
236-280) but never exports or uses it — DiffRoll replaced the waveform
output with piano rolls. It is rebuilt here for inventory parity and as a
working audio-diffusion baseline: a (B, L) waveform denoiser conditioned
on (B, frames, n_mels) mel spectrograms upsampled 256x in time by two
transposed convs.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .embedding import DiffusionEmbedding
from .resblock import _conv_init

_SQRT_HALF = 0.7071067811865476


class SpectrogramUpsampler(nn.Module):
    """(B, frames, n_mels) -> (B, frames*256, n_mels): two leaky-ReLU
    ConvTranspose layers, 16x each (reference model/diffwave.py:91-104)."""

    @nn.compact
    def __call__(self, spec: jnp.ndarray) -> jnp.ndarray:
        x = spec[..., None]  # (B, T, M, 1) — time upsampled, mel kept
        for _ in range(2):
            x = nn.ConvTranspose(1, (32, 3), strides=(16, 1),
                                 padding="SAME")(x)
            x = nn.leaky_relu(x, 0.4)
        return x[..., 0]


class DiffWaveResBlock(nn.Module):
    """Gated dilated conv over raw audio (B, L, C) with per-sample mel
    conditioning (reference ResidualBlock in its original audio role)."""

    residual_channels: int
    dilation: int
    n_mels: int

    @nn.compact
    def __call__(self, x, t_emb, mel_up):
        c = self.residual_channels
        step = nn.Dense(c, name="diffusion_projection")(t_emb)
        y = x + step[:, None, :]
        y = nn.Conv(2 * c, (3,), kernel_dilation=(self.dilation,),
                    padding="SAME", kernel_init=_conv_init,
                    name="dilated_conv")(y)
        cond = nn.Conv(2 * c, (1,), kernel_init=_conv_init,
                       name="conditioner_projection")(mel_up)
        y = y + cond
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = nn.Conv(2 * c, (1,), kernel_init=_conv_init,
                    name="output_projection")(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) * _SQRT_HALF, skip


class DiffWaveNet(nn.Module):
    """Waveform denoiser: (B, L) audio + (B,) t + (B, L/256 frames, n_mels)
    mel -> (B, L) predicted noise (reference model/diffwave.py:236-280)."""

    residual_channels: int = 64
    residual_layers: int = 30
    dilation_cycle_length: int = 10
    n_mels: int = 80
    max_steps: int = 50

    @nn.compact
    def __call__(self, audio: jnp.ndarray, t: jnp.ndarray,
                 mel: Optional[jnp.ndarray]) -> jnp.ndarray:
        x = audio[..., None]  # (B, L, 1)
        x = nn.relu(nn.Conv(self.residual_channels, (1,),
                            kernel_init=_conv_init,
                            name="input_projection")(x))
        t_emb = DiffusionEmbedding(self.max_steps,
                                   name="diffusion_embedding")(t)
        mel_up = SpectrogramUpsampler(name="spectrogram_upsampler")(mel)
        mel_up = mel_up[:, : x.shape[1]]  # trim to audio length

        skip_sum = None
        for i in range(self.residual_layers):
            block = DiffWaveResBlock(
                residual_channels=self.residual_channels,
                dilation=2 ** (i % self.dilation_cycle_length),
                n_mels=self.n_mels,
                name=f"residual_layers_{i}",
            )
            x, skip = block(x, t_emb, mel_up)
            skip_sum = skip if skip_sum is None else skip_sum + skip

        x = skip_sum / math.sqrt(self.residual_layers)
        x = nn.relu(nn.Conv(self.residual_channels, (1,),
                            kernel_init=_conv_init,
                            name="skip_projection")(x))
        x = nn.Conv(1, (1,), kernel_init=nn.initializers.zeros,
                    name="output_projection")(x)
        return x[..., 0]
