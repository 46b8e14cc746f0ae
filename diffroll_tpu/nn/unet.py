"""U-Net denoisers over piano rolls (the reference's experimental family).

TPU-native rebuild of `Unet` / `SpecUnet` (reference model/unet.py:205-319,
412-555): ConvNext (or ResNet) blocks, linear attention at every scale,
full attention at the bottleneck, sinusoidal time MLP; `SpecUnet` adds a
parallel spectrogram encoder merged additively inside each block and
concatenated into the up-path skips.

Layout is NHWC — rolls are (B, T, 88, C) images — so convs map straight to
TPU convolution layouts without transposes. Known reference quirks NOT
replicated (SURVEY.md §7): the dead `spec_downsample` modules (reference
model/unet.py:536-537 allocates them; the forward reuses the x downsampler
for the spec path, :534) — here each path owns its downsampler.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class SinusoidalTimeEmbedding(nn.Module):
    """sin/cos embedding + 2-layer GELU MLP (reference model/unet.py:51-64,
    233-240). Returns (B, 4*dim)."""

    dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.dim // 2
        freqs = jnp.exp(jnp.arange(half) * -(math.log(10000.0) / (half - 1)))
        ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
        emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        emb = nn.Dense(self.dim * 4)(emb)
        emb = nn.gelu(emb)
        return nn.Dense(self.dim * 4)(emb)


class ConvNextBlock(nn.Module):
    """Depthwise 7x7 + pointwise MLP block with additive time bias
    (reference model/unet.py:109-141)."""

    dim_out: int
    mult: int = 2
    norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, t_emb: Optional[jnp.ndarray] = None):
        c = x.shape[-1]
        h = nn.Conv(c, (7, 7), feature_group_count=c, name="ds_conv")(x)
        if t_emb is not None:
            bias = nn.Dense(c, name="time_mlp")(nn.gelu(t_emb))
            h = h + bias[:, None, None, :]
        if self.norm:
            h = nn.GroupNorm(num_groups=1)(h)
        h = nn.Conv(self.dim_out * self.mult, (3, 3))(h)
        h = nn.gelu(h)
        h = nn.GroupNorm(num_groups=1)(h)
        h = nn.Conv(self.dim_out, (3, 3))(h)
        res = x if c == self.dim_out else nn.Conv(self.dim_out, (1, 1),
                                                  name="res_conv")(x)
        return h + res


class ResnetBlock(nn.Module):
    """Classic two-conv residual block with GroupNorm/SiLU and additive
    time bias between convs (reference model/unet.py:84-107)."""

    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, t_emb: Optional[jnp.ndarray] = None):
        h = nn.Conv(self.dim_out, (3, 3))(x)
        h = nn.silu(nn.GroupNorm(num_groups=self.groups)(h))
        if t_emb is not None:
            bias = nn.Dense(self.dim_out, name="time_mlp")(nn.silu(t_emb))
            h = h + bias[:, None, None, :]
        h = nn.Conv(self.dim_out, (3, 3))(h)
        h = nn.silu(nn.GroupNorm(num_groups=self.groups)(h))
        c = x.shape[-1]
        res = x if c == self.dim_out else nn.Conv(self.dim_out, (1, 1),
                                                  name="res_conv")(x)
        return h + res


def _qkv_heads(x: jnp.ndarray, heads: int, dim_head: int):
    """1x1-conv QKV, reshaped to (B, heads, H*W, dim_head) each."""
    b, h, w, _ = x.shape
    qkv = nn.Conv(heads * dim_head * 3, (1, 1), use_bias=False,
                  name="to_qkv")(x)
    qkv = qkv.reshape(b, h * w, 3, heads, dim_head)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    return q, k, v


class Attention(nn.Module):
    """Full softmax attention over all H*W positions — bottleneck only
    (reference model/unet.py:152-176)."""

    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        q, k, v = _qkv_heads(x, self.heads, self.dim_head)
        sim = jnp.einsum("bhid,bhjd->bhij", q * self.dim_head**-0.5, k)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, -1)
        return nn.Conv(c, (1, 1), name="to_out")(out)


class LinearAttention(nn.Module):
    """O(N) attention: softmax(q over d), softmax(k over n), shared k^T v
    context (reference model/unet.py:178-203)."""

    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        q, k, v = _qkv_heads(x, self.heads, self.dim_head)
        q = jax.nn.softmax(q, axis=-1) * self.dim_head**-0.5
        k = jax.nn.softmax(k, axis=-2)
        context = jnp.einsum("bhnd,bhne->bhde", k, v)
        out = jnp.einsum("bhde,bhnd->bhne", context, q)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, -1)
        out = nn.Conv(c, (1, 1))(out)
        return nn.GroupNorm(num_groups=1)(out)


class PreNormResidual(nn.Module):
    """x + fn(GroupNorm(x)) (reference model/unet.py:37-49, 144-150)."""

    fn: nn.Module

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x + self.fn(nn.GroupNorm(num_groups=1)(x))


def _downsample(x: jnp.ndarray, dim: int, name: str) -> jnp.ndarray:
    return nn.Conv(dim, (4, 4), strides=(2, 2), name=name)(x)


def _upsample(x: jnp.ndarray, dim: int, name: str) -> jnp.ndarray:
    # equivalent of torch ConvTranspose2d(dim, dim, 4, 2, 1): exact 2x
    b, h, w, _ = x.shape
    y = nn.ConvTranspose(dim, (4, 4), strides=(2, 2), padding="SAME",
                         name=name)(x)
    return y[:, : 2 * h, : 2 * w, :]


class UnetNet(nn.Module):
    """Unconditional roll denoiser (reference model/unet.py:205-319).

    (B, T, 88) noisy roll + (B,) t -> (B, T, 88) predicted noise.
    """

    dim: int = 28
    dim_mults: Tuple[int, ...] = (1, 2, 4)
    use_convnext: bool = True
    convnext_mult: int = 2
    resnet_block_groups: int = 8

    def _block(self, dim_out: int, name: str):
        if self.use_convnext:
            return ConvNextBlock(dim_out, mult=self.convnext_mult, name=name)
        return ResnetBlock(dim_out, groups=self.resnet_block_groups, name=name)

    @nn.compact
    def __call__(self, x, t, cond=None, uncond_mask=None):
        del cond, uncond_mask  # unconditional family
        x = x[..., None]  # (B, T, 88, 1)
        init_dim = self.dim // 3 * 2
        x = nn.Conv(init_dim, (7, 7), name="init_conv")(x)
        t_emb = SinusoidalTimeEmbedding(self.dim, name="time_mlp")(t)

        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        n_res = len(in_out)

        skips = []
        for i, (_, d_out) in enumerate(in_out):
            x = self._block(d_out, f"down_{i}_block1")(x, t_emb)
            x = self._block(d_out, f"down_{i}_block2")(x, t_emb)
            x = PreNormResidual(LinearAttention(), name=f"down_{i}_attn")(x)
            skips.append(x)
            if i < n_res - 1:
                x = _downsample(x, d_out, f"down_{i}_ds")

        mid = dims[-1]
        x = self._block(mid, "mid_block1")(x, t_emb)
        x = PreNormResidual(Attention(), name="mid_attn")(x)
        x = self._block(mid, "mid_block2")(x, t_emb)

        for i, (d_in, _) in enumerate(reversed(in_out[1:])):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = self._block(d_in, f"up_{i}_block1")(x, t_emb)
            x = self._block(d_in, f"up_{i}_block2")(x, t_emb)
            x = PreNormResidual(LinearAttention(), name=f"up_{i}_attn")(x)
            x = _upsample(x, d_in, f"up_{i}_us")

        x = self._block(self.dim, "final_block")(x, t_emb)
        x = nn.Conv(1, (1, 1), name="final_conv")(x)
        return x[..., 0]


class SpecConvNextBlock(nn.Module):
    """ConvNext block pair with a parallel spec stream merged additively
    (reference model/unet.py:322-410). Returns (x_out, spec_out)."""

    dim_out: int
    mult: int = 2
    norm: bool = True
    # up-path variant: x has 3x channels, spec keeps its own width and is
    # lifted by a dense 7x7 conv (reference SpecConvNextBlockUp, :374-410)
    spec_dense_lift: bool = False

    @nn.compact
    def __call__(self, x, spec, t_emb=None):
        c = x.shape[-1]
        h = nn.Conv(c, (7, 7), feature_group_count=c, name="ds_conv")(x)
        if self.spec_dense_lift:
            spec_h = nn.Conv(c, (7, 7), name="spec_ds_conv")(spec)
        else:
            cs = spec.shape[-1]
            spec_h = nn.Conv(cs, (7, 7), feature_group_count=cs,
                             name="spec_ds_conv")(spec)
        if t_emb is not None:
            bias = nn.Dense(c, name="time_mlp")(nn.gelu(t_emb))
            h = h + spec_h + bias[:, None, None, :]

        def _net(z, prefix):
            if self.norm:
                z = nn.GroupNorm(num_groups=1, name=f"{prefix}norm1")(z)
            z = nn.Conv(self.dim_out * self.mult, (3, 3), name=f"{prefix}conv1")(z)
            z = nn.gelu(z)
            z = nn.GroupNorm(num_groups=1, name=f"{prefix}norm2")(z)
            return nn.Conv(self.dim_out, (3, 3), name=f"{prefix}conv2")(z)

        out = _net(h, "net_")
        spec_out = _net(spec_h, "spec_net_")
        res = x if c == self.dim_out else nn.Conv(self.dim_out, (1, 1),
                                                  name="res_conv")(x)
        return out + res, spec_out


class SpecUnetNet(nn.Module):
    """Spec-conditioned U-Net (reference model/unet.py:412-553).

    (B, T, 88) roll + (B,) t + (B, T, n_mels) log-mel -> (B, T, 88).
    Up-path skips concatenate both the x and spec streams (3x width,
    reference :496). `uncond_mask` substitutes spec := -1 per sample,
    keeping the CFG contract of the flagship model.
    """

    dim: int = 28
    dim_mults: Tuple[int, ...] = (1, 2, 4)
    convnext_mult: int = 2

    @nn.compact
    def __call__(self, x, t, cond, uncond_mask=None):
        if uncond_mask is not None:
            sub = jnp.full_like(cond, -1.0)
            cond = jnp.where(uncond_mask[:, None, None], sub, cond)
        x = x[..., None]
        spec = cond[..., None]  # (B, T, n_mels, 1)
        init_dim = self.dim // 3 * 2
        x = nn.Conv(init_dim, (7, 7), name="init_conv")(x)
        spec = nn.Conv(init_dim, (7, 7), name="spec_init_conv")(spec)
        # project the mel axis down to the 88-key axis so the two streams
        # share spatial shape (reference spec_init_fc, :435)
        spec = jnp.swapaxes(spec, 2, 3)  # (B, T, C, n_mels)
        spec = nn.Dense(x.shape[2], name="spec_init_fc")(spec)
        spec = jnp.swapaxes(spec, 2, 3)  # (B, T, 88, C)

        t_emb = SinusoidalTimeEmbedding(self.dim, name="time_mlp")(t)
        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        n_res = len(in_out)

        skips = []
        for i, (_, d_out) in enumerate(in_out):
            x, spec = SpecConvNextBlock(d_out, mult=self.convnext_mult,
                                        name=f"down_{i}_block1")(x, spec, t_emb)
            x, spec = SpecConvNextBlock(d_out, mult=self.convnext_mult,
                                        name=f"down_{i}_block2")(x, spec, t_emb)
            x = PreNormResidual(LinearAttention(), name=f"down_{i}_attn")(x)
            skips.append((x, spec))
            if i < n_res - 1:
                x = _downsample(x, d_out, f"down_{i}_ds")
                spec = _downsample(spec, d_out, f"down_{i}_spec_ds")

        mid = dims[-1]
        x, spec = SpecConvNextBlock(mid, mult=self.convnext_mult,
                                    name="mid_block1")(x, spec, t_emb)
        x = PreNormResidual(Attention(), name="mid_attn")(x)
        x, spec = SpecConvNextBlock(mid, mult=self.convnext_mult,
                                    name="mid_block2")(x, spec, t_emb)

        for i, (d_in, _) in enumerate(reversed(in_out[1:])):
            x_skip, spec_skip = skips.pop()
            x = jnp.concatenate([x, x_skip, spec_skip], axis=-1)
            x, spec = SpecConvNextBlock(
                d_in, mult=self.convnext_mult, spec_dense_lift=True,
                name=f"up_{i}_block1",
            )(x, spec, t_emb)
            x, spec = SpecConvNextBlock(d_in, mult=self.convnext_mult,
                                        name=f"up_{i}_block2")(x, spec, t_emb)
            x = PreNormResidual(LinearAttention(), name=f"up_{i}_attn")(x)
            x = _upsample(x, d_in, f"up_{i}_us")
            spec = _upsample(spec, d_in, f"up_{i}_spec_us")

        x, _ = SpecConvNextBlock(self.dim, mult=self.convnext_mult,
                                 name="final_block")(x, spec, t_emb)
        x = nn.Conv(1, (1, 1), name="final_conv")(x)
        return x[..., 0]
