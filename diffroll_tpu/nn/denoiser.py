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

Sampler fast path: `cond_projections` (exposed via
`net.apply(params, cond, mask, method="cond_projections")`) precomputes
every layer's projected conditioner (B, T, 2C). The reverse-diffusion loop
computes it ONCE per clip and passes it back via `cond_proj=`; the per-step
forward is then just the dilated-conv/gate/projection chain. The reference
re-projects the conditioner inside all 400 forwards of a CFG sampling run
(reference model/diffwave.py:143 runs inside forward, task/diffusion.py:779).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

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
    frames: int = 640              # roll frames (trainable_z embedding length)
    spec_frames: int = 641         # trainable_spec parameter length
    n_mels: int = 229              # trainable_spec parameter width
    dtype: object = None           # computation dtype (params stay f32)

    def setup(self):
        if self.condition not in ("fixed", "trainable_spec", "trainable_z"):
            raise ValueError(f"unrecognized condition {self.condition!r}")
        c = self.residual_channels
        self.input_projection = nn.Conv(c, (1,), kernel_init=_conv_init,
                                        dtype=self.dtype)
        self.diffusion_embedding = DiffusionEmbedding(self.max_steps)
        self.blocks = [
            ResidualBlock(
                residual_channels=c,
                dilation=self.dilation_base ** (i % self.dilation_bound),
                kernel_size=self.kernel_size,
                conditional=not self.unconditional,
                trainable_z=(self.condition == "trainable_z"),
                z_frames=self.frames,
                dtype=self.dtype,
                name=f"residual_layers_{i}",
            )
            for i in range(self.residual_layers)
        ]
        self.skip_projection = nn.Conv(c, (1,), kernel_init=_conv_init,
                                       dtype=self.dtype)
        # zero-init head (reference model/diffwave.py:307, 631) so the net
        # predicts 0 at init and diffusion training starts from the prior
        self.output_projection = nn.Conv(
            self.out_features, (1,), kernel_init=nn.initializers.zeros
        )
        if self.condition == "trainable_spec":
            self.trainable_parameters = self.param(
                "trainable_parameters",
                lambda key, shape: jnp.full(shape, -1.0, jnp.float32),
                (self.spec_frames, self.n_mels),
            )

    def cond_projections(
        self,
        cond: jnp.ndarray,
        uncond_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, ...]:
        """(B, T, n_cond) -> per-layer projected conditioners (B, T, 2C),
        with the unconditional substitution applied per `condition` mode."""
        if self.unconditional:
            raise ValueError("unconditional net has no conditioner")
        if uncond_mask is not None:
            if self.condition == "fixed":
                cond = jnp.where(uncond_mask[:, None, None], -1.0, cond)
            elif self.condition == "trainable_spec":
                tp = self.trainable_parameters[None, : cond.shape[1]]
                cond = jnp.where(uncond_mask[:, None, None], tp, cond)
        z_mask = uncond_mask if self.condition == "trainable_z" else None
        return tuple(block.cond_proj(cond, z_mask) for block in self.blocks)

    def __call__(
        self,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
        uncond_mask: Optional[jnp.ndarray] = None,
        cond_proj: Optional[Sequence[jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        """x_t (B, T, 88), t (B,), cond (B, T, n_cond) or None -> (B, T, 88).

        Pass either `cond` (projections computed inline — the training
        path) or `cond_proj` (precomputed once per clip — the sampler path).
        """
        conditional = not self.unconditional and (
            cond is not None or cond_proj is not None
        )
        if conditional and cond_proj is None:
            cond_proj = self.cond_projections(cond, uncond_mask)

        x = nn.relu(self.input_projection(x_t))
        t_emb = self.diffusion_embedding(t)

        skip_sum = None
        for i, block in enumerate(self.blocks):
            x, skip = block(x, t_emb, cond_proj[i] if conditional else None)
            skip_sum = skip if skip_sum is None else skip_sum + skip

        x = skip_sum / math.sqrt(self.residual_layers)
        x = nn.relu(self.skip_projection(x))
        # head + loss math stay f32 regardless of the compute dtype
        return self.output_projection(x).astype(jnp.float32)


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

    def setup(self):
        c = self.residual_channels
        self.input_projection = nn.Conv(c, (1, 1), kernel_init=_conv_init)
        self.diffusion_embedding = DiffusionEmbedding(self.max_steps)
        if self.project_cond:
            self.spec_projection = nn.Conv(88, (1,), kernel_init=_conv_init)
        self.blocks = [
            ResidualBlock2D(
                residual_channels=c,
                dilation=self.dilation_base ** (i % self.dilation_bound),
                kernel_size=self.kernel_size,
                conditional=not self.unconditional,
                name=f"residual_layers_{i}",
            )
            for i in range(self.residual_layers)
        ]
        self.skip_projection = nn.Conv(c, (1, 1), kernel_init=_conv_init)
        self.output_projection = nn.Conv(
            1, (1, 1), kernel_init=nn.initializers.zeros
        )

    def cond_projections(
        self,
        cond: jnp.ndarray,
        uncond_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, ...]:
        """(B, T, n_cond) -> per-layer (B, T, 88, 2C) projections."""
        if self.unconditional:
            raise ValueError("unconditional net has no conditioner")
        if self.project_cond:
            cond = self.spec_projection(cond)
        if uncond_mask is not None:
            cond = jnp.where(uncond_mask[:, None, None], -1.0, cond)
        cond = cond[..., None]  # (B, T, 88, 1)
        return tuple(block.cond_proj(cond) for block in self.blocks)

    def __call__(
        self,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
        uncond_mask: Optional[jnp.ndarray] = None,
        cond_proj: Optional[Sequence[jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        """x_t (B, T, 88), t (B,), cond (B, T, n_cond) -> (B, T, 88)."""
        conditional = not self.unconditional and (
            cond is not None or cond_proj is not None
        )
        if conditional and cond_proj is None:
            cond_proj = self.cond_projections(cond, uncond_mask)

        x = x_t[..., None]  # (B, T, 88, 1)
        x = nn.relu(self.input_projection(x))
        t_emb = self.diffusion_embedding(t)

        skip_sum = None
        for i, block in enumerate(self.blocks):
            x, skip = block(x, t_emb, cond_proj[i] if conditional else None)
            skip_sum = skip if skip_sum is None else skip_sum + skip

        x = skip_sum / math.sqrt(self.residual_layers)
        x = nn.relu(self.skip_projection(x))
        return self.output_projection(x)[..., 0]  # (B, T, 88)
