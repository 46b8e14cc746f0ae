"""DiffRoll denoiser stacks (1-D and 2-D), pure networks.

Where the reference fuses network + diffusion-task + DSP into one class by
inheritance (reference model/diffwave.py:283-345, 579-699), this module is
*just the network*: x_t and an already-computed conditioner go in, the
prediction comes out. The mel front-end, normalization, spec dropout and
inpainting masks live in `diffroll_tpu.models.conditioning`; the diffusion
math lives in `diffroll_tpu.diffusion`.

Shared body (reference model/diffwave.py:295-345 / :596-686):
  input_projection Conv1x1(88 -> C) + ReLU
  -> N x ResidualBlock(dilation = base^(i % bound))
  -> sum(skips)/sqrt(N) -> skip_projection Conv1x1 + ReLU
  -> zero-init output_projection Conv1x1(C -> 88)

Classifier-free conditioning (reference ClassifierFreeDiffRoll):
  * condition='fixed'         : unconditional rows get spec := -1
  * condition='trainable_spec': unconditional rows get a learned (T, n_mels)
                                spectrogram parameter (init -1)
  * condition='trainable_z'   : blocks swap in a learned per-layer embedding
All three are driven by an explicit per-sample boolean `uncond_mask`
(train-time Bernoulli(p) dropout, sampling-time all-True for the CFG
unconditional branch) instead of the reference's in-place tensor surgery.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .embedding import DiffusionEmbedding
from .resblock import ResidualBlock, ResidualBlock2D, _conv_init


class DiffRollNet(nn.Module):
    """1-D DiffRoll denoiser over (B, T, 88) rolls.

    Covers the reference's DiffRoll, DiffRollDebug, DiffRollBaseline and
    ClassifierFreeDiffRoll bodies — they differ only in hyperparameters and
    in what conditioner is fed (log-mel spec, ground-truth roll, or None).
    """

    residual_channels: int = 512
    residual_layers: int = 15
    kernel_size: int = 3
    dilation_base: int = 1
    dilation_bound: int = 4
    max_steps: int = 200           # diffusion-embedding table size (T)
    out_features: int = 88
    unconditional: bool = False
    condition: str = "fixed"       # 'fixed' | 'trainable_spec' | 'trainable_z'
    spec_frames: int = 641         # trainable_spec parameter length
    n_mels: int = 229              # trainable_spec parameter width

    @nn.compact
    def __call__(
        self,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
        uncond_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x_t (B, T, 88), t (B,), cond (B, T, n_cond) or None -> (B, T, 88)."""
        if self.condition not in ("fixed", "trainable_spec", "trainable_z"):
            raise ValueError(f"unrecognized condition {self.condition!r}")

        conditional = not self.unconditional and cond is not None

        if conditional and uncond_mask is not None:
            if self.condition == "fixed":
                cond = jnp.where(uncond_mask[:, None, None], -1.0, cond)
            elif self.condition == "trainable_spec":
                tp = self.param(
                    "trainable_parameters",
                    lambda key, shape: jnp.full(shape, -1.0, jnp.float32),
                    (self.spec_frames, self.n_mels),
                )
                cond = jnp.where(
                    uncond_mask[:, None, None], tp[None, : cond.shape[1]], cond
                )
            # trainable_z: mask is consumed inside each block

        x = nn.Conv(
            self.residual_channels, (1,), kernel_init=_conv_init,
            name="input_projection",
        )(x_t)
        x = nn.relu(x)

        t_emb = DiffusionEmbedding(self.max_steps, name="diffusion_embedding")(t)

        skip_sum = None
        for i in range(self.residual_layers):
            block = ResidualBlock(
                residual_channels=self.residual_channels,
                dilation=self.dilation_base ** (i % self.dilation_bound),
                kernel_size=self.kernel_size,
                conditional=conditional,
                trainable_z=(self.condition == "trainable_z"),
                name=f"residual_layers_{i}",
            )
            x, skip = block(
                x,
                t_emb,
                cond if conditional else None,
                uncond_mask if self.condition == "trainable_z" else None,
            )
            skip_sum = skip if skip_sum is None else skip_sum + skip

        x = skip_sum / math.sqrt(self.residual_layers)
        x = nn.Conv(
            self.residual_channels, (1,), kernel_init=_conv_init,
            name="skip_projection",
        )(x)
        x = nn.relu(x)
        # zero-init head (reference model/diffwave.py:307, 631) so the net
        # predicts 0 at init and diffusion training starts from the prior
        x = nn.Conv(
            self.out_features, (1,), kernel_init=nn.initializers.zeros,
            name="output_projection",
        )(x)
        return x


class DiffRollNet2D(nn.Module):
    """2-D DiffRoll denoiser over (B, T, 88) rolls treated as images
    (reference DiffRollv2 / DiffRollv2Debug, model/diffwave.py:347-513).

    The conditioner is the log-mel spec projected n_mels -> 88 and treated
    as a 1-channel image aligned with the roll (reference :359, 385), or the
    ground-truth roll for the debug variant.
    """

    residual_channels: int = 16
    residual_layers: int = 30
    kernel_size: int = 3
    dilation_base: int = 1
    dilation_bound: int = 10
    max_steps: int = 200
    out_features: int = 88
    unconditional: bool = False
    project_cond: bool = True      # False for debug variant (roll conditioner)

    @nn.compact
    def __call__(
        self,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
        uncond_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x_t (B, T, 88), t (B,), cond (B, T, n_cond) -> (B, T, 88)."""
        conditional = not self.unconditional and cond is not None
        if conditional:
            if self.project_cond:
                cond = nn.Conv(
                    88, (1,), kernel_init=_conv_init, name="spec_projection"
                )(cond)
            if uncond_mask is not None:
                cond = jnp.where(uncond_mask[:, None, None], -1.0, cond)
            cond = cond[..., None]  # (B, T, 88, 1)

        x = x_t[..., None]  # (B, T, 88, 1)
        x = nn.Conv(
            self.residual_channels, (1, 1), kernel_init=_conv_init,
            name="input_projection",
        )(x)
        x = nn.relu(x)

        t_emb = DiffusionEmbedding(self.max_steps, name="diffusion_embedding")(t)

        skip_sum = None
        for i in range(self.residual_layers):
            block = ResidualBlock2D(
                residual_channels=self.residual_channels,
                dilation=self.dilation_base ** (i % self.dilation_bound),
                kernel_size=self.kernel_size,
                conditional=conditional,
                name=f"residual_layers_{i}",
            )
            x, skip = block(x, t_emb, cond if conditional else None)
            skip_sum = skip if skip_sum is None else skip_sum + skip

        x = skip_sum / math.sqrt(self.residual_layers)
        x = nn.Conv(
            self.residual_channels, (1, 1), kernel_init=_conv_init,
            name="skip_projection",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            1, (1, 1), kernel_init=nn.initializers.zeros,
            name="output_projection",
        )(x)
        return x[..., 0]  # (B, T, 88)
