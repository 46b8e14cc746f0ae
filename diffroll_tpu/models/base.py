"""Model wrapper: config + pure functional forward, composing the denoiser
net with its DSP front-end.

The reference fuses net/task/DSP in one LightningModule hierarchy
(reference model/diffwave.py:283, 579: model subclasses the task). Here a
`DiffRollModel` is a thin, stateless bundle of
  * a `DiffRollConfig` (mirrors the reference's model yaml args),
  * a flax net (`DiffRollNet` / `DiffRollNet2D`),
  * the conditioning pipeline (mel front-end etc.),
and the diffusion/task logic lives in `diffroll_tpu.tasks`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..dsp.mel import MelConfig, MelSpectrogram
from ..dsp.normalize import min_max_normalize
from ..nn.denoiser import DiffRollNet, DiffRollNet2D
from ..nn.unet import SpecUnetNet, UnetNet
from . import conditioning


@dataclasses.dataclass(frozen=True)
class DiffRollConfig:
    """Union of the reference model yaml knobs (config/model/*.yaml)."""

    name: str = "ClassifierFreeDiffRoll"
    variant: str = "1d"              # '1d' | '2d' | 'unet' | 'spec_unet'
    cond_source: str = "spec"        # 'spec' | 'roll' (debug) | 'none'
    residual_channels: int = 512     # U-Net variants: the base `dim`
    residual_layers: int = 15
    kernel_size: int = 3
    dilation_base: int = 2
    dilation_bound: int = 4
    condition: str = "fixed"         # 'fixed' | 'trainable_spec' | 'trainable_z'
    unconditional: bool = False
    spec_dropout: float = 0.1
    # (min, max, mode) applied to the *roll* before diffusion
    # (reference model/diffwave.py:634 + task/diffusion.py:653)
    norm_args: Tuple[float, float, str] = (0.0, 1.0, "imagewise")
    # how the log-mel conditioner is normalized:
    #   'unit'      -> min-max to [0,1] (ClassifierFreeDiffRoll, :632)
    #   'norm_args' -> min-max to norm_args range (DiffRoll, :312)
    #   'none'      -> raw log-mel (DiffRollv2, :383-385)
    spec_norm: str = "unit"
    n_mels: int = 229
    # U-Net family knobs (reference model/unet.py:205-230, config/model/Unet.yaml)
    dim_mults: Tuple[int, ...] = (1, 2, 4)
    use_convnext: bool = True
    convnext_mult: int = 2
    resnet_block_groups: int = 8
    timesteps: int = 200
    frames: int = 640
    pitches: int = 88
    mel: MelConfig = MelConfig()
    dtype: Any = jnp.float32

    def replace(self, **kw) -> "DiffRollConfig":
        return dataclasses.replace(self, **kw)

    def dilations(self) -> Tuple[int, ...]:
        """Per-layer dilation schedule base^(i % bound) (reference
        model/diffwave.py:623-626) — the single source for every fused-op
        and halo-exchange consumer; nn/denoiser.py applies the same rule
        per layer."""
        return tuple(self.dilation_base ** (i % self.dilation_bound)
                     for i in range(self.residual_layers))


class DiffRollModel:
    """Stateless functional model. All methods take explicit params/keys."""

    def __init__(self, config: DiffRollConfig):
        self.config = config
        c = config
        if c.variant == "1d":
            self.net = DiffRollNet(
                residual_channels=c.residual_channels,
                residual_layers=c.residual_layers,
                kernel_size=c.kernel_size,
                dilation_base=c.dilation_base,
                dilation_bound=c.dilation_bound,
                max_steps=c.timesteps,
                out_features=c.pitches,
                unconditional=c.unconditional,
                condition=c.condition,
                frames=c.frames,
                spec_frames=c.mel.num_frames(
                    c.frames * c.mel.hop_length
                ),
                n_mels=c.n_mels,
                dtype=None if c.dtype in (jnp.float32, "float32") else c.dtype,
            )
        elif c.variant == "2d":
            self.net = DiffRollNet2D(
                residual_channels=c.residual_channels,
                residual_layers=c.residual_layers,
                kernel_size=c.kernel_size,
                dilation_base=c.dilation_base,
                dilation_bound=c.dilation_bound,
                max_steps=c.timesteps,
                out_features=c.pitches,
                unconditional=c.unconditional,
                project_cond=(c.cond_source == "spec"),
            )
        elif c.variant == "unet":
            self.net = UnetNet(
                dim=c.residual_channels,
                dim_mults=c.dim_mults,
                use_convnext=c.use_convnext,
                convnext_mult=c.convnext_mult,
                resnet_block_groups=c.resnet_block_groups,
            )
        elif c.variant == "spec_unet":
            self.net = SpecUnetNet(
                dim=c.residual_channels,
                dim_mults=c.dim_mults,
                convnext_mult=c.convnext_mult,
            )
        else:
            raise ValueError(f"unknown variant {c.variant!r}")
        mel_cfg = c.mel
        if mel_cfg.method == "fft" and mel_cfg.precision == "highest":
            # auto-select the TPU mel execution path (explicitly-set
            # mel.method / mel.precision are honored unchanged). Profiled
            # at B=16 on v5e: the fft AND matmul paths both cost ~11 ms
            # because the framing GATHER dominates; the strided-conv DFT
            # materializes no frame tensor. bf16 models additionally drop
            # to single-pass MXU precision — their conditioner feeds bf16
            # convs, so the residual DFT error sits below bf16 resolution
            # after log + min-max (tests/test_mel.py bounds it).
            # the conv path requires hop_length | n_fft (it reshapes audio
            # into hop chunks, dsp/mel.py:178); non-dividing geometries
            # (e.g. hop=160, n_fft=2048) fall back to the matmul DFT, which
            # also avoids the framing gather
            conv = "conv" if mel_cfg.n_fft % mel_cfg.hop_length == 0 \
                else "matmul"
            if c.dtype in (jnp.bfloat16, "bfloat16"):
                mel_cfg = dataclasses.replace(mel_cfg, method=conv,
                                              precision="default")
            elif jax.default_backend() == "tpu":
                mel_cfg = dataclasses.replace(mel_cfg, method=conv,
                                              precision="highest")
        self.mel = MelSpectrogram(mel_cfg) if c.cond_source == "spec" else None

    # ---- parameters ------------------------------------------------------

    def init(self, key: jax.Array) -> Any:
        c = self.config
        x = jnp.zeros((1, c.frames, c.pitches), c.dtype)
        t = jnp.zeros((1,), jnp.int32)
        cond = self._dummy_cond()
        mask = jnp.zeros((1,), bool) if cond is not None else None
        return self.net.init(key, x, t, cond, mask)

    def _dummy_cond(self) -> Optional[jnp.ndarray]:
        c = self.config
        if c.cond_source == "spec":
            return jnp.zeros((1, c.frames, c.n_mels), c.dtype)
        if c.cond_source == "roll":
            return jnp.zeros((1, c.frames, c.pitches), c.dtype)
        return None

    # ---- data plumbing ---------------------------------------------------

    def normalize_roll(self, roll: jnp.ndarray) -> jnp.ndarray:
        """Min-max the (B, T, 88) roll to norm_args range
        (reference task/diffusion.py:653 via model/diffwave.py:634).
        mode='none' passes rolls through raw — the RollDiffusion/U-Net task
        trains on unnormalized rolls (reference task/diffusion.py:96-100)."""
        lo, hi, mode = self.config.norm_args
        if mode == "none":
            return roll
        return min_max_normalize(roll, lo, hi, mode)

    def conditioner(
        self,
        waveform: Optional[jnp.ndarray] = None,
        roll: Optional[jnp.ndarray] = None,
        inpainting_t: Optional[Sequence[int]] = None,
        inpainting_f: Optional[Sequence[int]] = None,
    ) -> Optional[jnp.ndarray]:
        """Build the (B, T, n_cond) conditioner from raw inputs.

        Computed once per clip and reused across all sampler steps (the
        reference recomputes it inside every forward).
        """
        c = self.config
        if c.cond_source == "none" or c.unconditional:
            return None
        if c.cond_source == "roll":
            cond = roll
        else:
            if c.spec_norm == "unit":
                rng: Optional[Tuple[float, float]] = (0.0, 1.0)
                mode = c.norm_args[2]
            elif c.spec_norm == "norm_args":
                rng = (c.norm_args[0], c.norm_args[1])
                mode = c.norm_args[2]
            elif c.spec_norm == "none":
                rng, mode = None, "imagewise"
            else:
                raise ValueError(f"unknown spec_norm {c.spec_norm!r}")
            cond = conditioning.compute_spec(self.mel, waveform, rng, mode)
            cond = conditioning.trim_to(c.frames, cond)
        return conditioning.apply_inpainting_mask(cond, inpainting_t, inpainting_f)

    # ---- forward ---------------------------------------------------------

    def apply(
        self,
        params: Any,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        cond: Optional[jnp.ndarray],
        uncond_mask: Optional[jnp.ndarray] = None,
        cond_proj: Optional[Any] = None,
    ) -> jnp.ndarray:
        """Denoiser forward: (B, T, 88) x (B,) x (B, T, n_cond) -> (B, T, 88)."""
        if cond_proj is None:  # U-Net variants take no cond_proj kwarg
            return self.net.apply(params, x_t, t, cond, uncond_mask)
        return self.net.apply(params, x_t, t, cond, uncond_mask,
                              cond_proj=cond_proj)

    def cond_projections(
        self,
        params: Any,
        cond: jnp.ndarray,
        uncond_mask: Optional[jnp.ndarray] = None,
    ) -> Any:
        """Precompute every layer's projected conditioner. Samplers call
        this ONCE per clip; the per-step forward then skips all conditioner
        convs (the reference recomputes them in each of its 400 forwards,
        reference model/diffwave.py:143)."""
        return self.net.apply(params, cond, uncond_mask,
                              method="cond_projections")

    def apply_cfg(
        self,
        params: Any,
        x_t: jnp.ndarray,
        t: jnp.ndarray,
        cond: Optional[jnp.ndarray] = None,
        cond_proj: Optional[Any] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Both classifier-free-guidance branches in ONE forward of 2B.

        The reference runs two sequential forwards per step (reference
        task/diffusion.py:951-952); batching them doubles MXU utilisation
        per launch and halves per-step latency at small B. Pass `cond_proj`
        (from `cfg_cond_projections`) to also skip the conditioner convs.
        """
        b = x_t.shape[0]
        x2 = jnp.concatenate([x_t, x_t], axis=0)
        t2 = jnp.concatenate([t, t], axis=0) if t.ndim else jnp.full((2 * b,), t)
        if cond_proj is None:
            cond2 = jnp.concatenate([cond, cond], axis=0)
            mask2 = jnp.concatenate(
                [jnp.zeros((b,), bool), jnp.ones((b,), bool)], axis=0
            )
            out = self.net.apply(params, x2, t2, cond2, mask2)
        else:
            out = self.net.apply(params, x2, t2, None, None,
                                 cond_proj=cond_proj)
        return out[:b], out[b:]

    def cfg_cond_projections(self, params: Any, cond: jnp.ndarray) -> Any:
        """Projected conditioners for the batched-CFG forward: rows [0, B)
        conditional, rows [B, 2B) unconditional."""
        b = cond.shape[0]
        cond2 = jnp.concatenate([cond, cond], axis=0)
        mask2 = jnp.concatenate(
            [jnp.zeros((b,), bool), jnp.ones((b,), bool)], axis=0
        )
        return self.cond_projections(params, cond2, mask2)


def param_count(params: Any) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
