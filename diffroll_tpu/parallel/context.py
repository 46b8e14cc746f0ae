"""Sequence (time-axis) context parallelism with halo exchange.

The DiffRoll denoiser is fully convolutional in time with a tiny receptive
field per layer ((k-1)/2 * dilation <= 8 frames), so ONE clip's time axis
can be sharded across devices: each device holds T/n frames, and each
layer's dilated conv exchanges `d` boundary frames with its neighbors over
ICI (`lax.ppermute`) before computing locally. Per-layer traffic is
2 * B * d * C floats — microscopic next to the matmuls — so per-clip
latency scales with chip count instead of only throughput.

No reference counterpart (the reference supports data-parallel DDP only,
SURVEY.md §2c; long audio is unsupported, its README.md:126). This module
is the `shard_map` expression of the stack; math is identical to
`ops.gated_stack_xla` / `nn.DiffRollNet` (tests assert equality against
the dense forward on a virtual device mesh).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops.fused_forward import _dense, _embed
from ..ops.gated_stack import GatedStackWeights, _pad_cond, stack_weights

_SQRT_HALF = 0.7071067811865476


def _exchange_halo(y: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """(B, Tl, C) local block -> (B, Tl + 2*halo, C) with neighbor frames
    (zeros at the global sequence ends)."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    # my last `halo` frames -> right neighbor's left halo, and vice versa
    right_perm = [(i, (i + 1) % n) for i in range(n)]
    left_perm = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(y[:, -halo:, :], axis_name, right_perm)
    from_right = jax.lax.ppermute(y[:, :halo, :], axis_name, left_perm)
    # zero the wrapped-around halos at the sequence boundary
    from_left = jnp.where(idx == 0, 0.0, from_left)
    from_right = jnp.where(idx == n - 1, 0.0, from_right)
    return jnp.concatenate([from_left, y, from_right], axis=1)


def _halo_stack(x, t_bias, cond, w: GatedStackWeights, dilations, axis_name):
    """The gated stack over a time-shard (B, Tl, C); math identical to
    ops.gated_stack_xla, shifts implemented on halo-extended blocks."""
    n_layers, k = w.wd.shape[0], w.wd.shape[1]
    ctr = k // 2
    skip_sum = jnp.zeros_like(x)
    cond_terms = None
    if cond is not None:
        cond = _pad_cond(cond, w.wc.shape[1])
        cond_terms = jnp.einsum("btm,lmc->lbtc", cond, w.wc)

    t_local = x.shape[1]
    for i in range(n_layers):
        d = int(dilations[i])
        y = x + t_bias[i][:, None, :]
        ypad = _exchange_halo(y, d * ctr if ctr else 1, axis_name)
        pad = d * ctr if ctr else 1
        acc = jnp.zeros(x.shape[:2] + (w.wd.shape[-1],), jnp.float32)
        for j in range(k):
            start = pad + (j - ctr) * d
            shifted = jax.lax.slice_in_dim(ypad, start, start + t_local, axis=1)
            acc = acc + jnp.einsum("btc,cd->btd", shifted, w.wd[i, j])
        acc = acc + w.b[i]
        if cond_terms is not None:
            acc = acc + cond_terms[i] + w.bc[i]
        c = x.shape[-1]
        g = jax.nn.sigmoid(acc[..., :c]) * jnp.tanh(acc[..., c:])
        out = jnp.einsum("btc,cd->btd", g, w.wo[i]) + w.bo[i]
        x = (x + out[..., :c]) * _SQRT_HALF
        skip_sum = skip_sum + out[..., c:]
    return skip_sum / math.sqrt(n_layers)


def sequence_parallel_forward(
    mesh: Mesh,
    params,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    cond: Optional[jnp.ndarray],
    *,
    n_layers: int,
    dilations,
    max_steps: int,
    axis: str = "data",
    weights: Optional[GatedStackWeights] = None,
) -> jnp.ndarray:
    """Denoiser forward with the TIME axis sharded over `mesh[axis]`.

    x_t (B, T, 88) and cond (B, T, M) are sharded on axis 1; params are
    replicated; T must divide by the axis size. Output is sharded the same
    way. Math matches `DiffRollNet.apply` (f32).
    """
    if weights is None:
        weights = stack_weights(params, n_layers)
    p = params["params"] if "params" in params else params
    dil = tuple(int(d) for d in dilations)

    # each layer's halo reaches only the immediate neighbor, so the local
    # shard must cover the largest per-layer halo
    taps = weights.wd.shape[1]
    halo = (taps // 2) * max(dil) if taps > 1 else 1
    t_local = x_t.shape[1] // mesh.shape[axis]
    if t_local < halo:
        raise ValueError(
            f"sequence-parallel shard of {t_local} frames cannot cover the "
            f"max conv halo of {halo}; need T/{axis}_size >= {halo} "
            f"(T={x_t.shape[1]}, {axis}={mesh.shape[axis]})"
        )

    def local(x_t, t, cond, p, w):
        x = jax.nn.relu(_dense(x_t, p["input_projection"]))
        t_emb = _embed(t, p["diffusion_embedding"], max_steps)
        t_bias = jnp.einsum("be,lec->lbc", t_emb, w.wt) + w.bt[:, None, :]
        skip = _halo_stack(x, t_bias, cond if w.wc is not None else None,
                           w, dil, axis)
        y = jax.nn.relu(_dense(skip, p["skip_projection"]))
        return _dense(y, p["output_projection"])

    seq = P(None, axis, None)
    cond_spec = seq if cond is not None else None
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(seq, P(), cond_spec, P(), P()),
        out_specs=seq,
    )
    return fn(x_t, t, cond, p, weights)


def sample_sequence_parallel(
    task,
    params,
    x_T: jnp.ndarray,
    key: jax.Array,
    mesh: Mesh,
    waveform: Optional[jnp.ndarray] = None,
    axis: str = "data",
):
    """Reverse diffusion for ONE long window with its time axis sharded
    across the mesh — per-clip latency scales with chip count."""
    from ..diffusion.loop import sample_loop

    mc = task.model.config
    cfg = task.config
    dil = mc.dilations()
    w = stack_weights(params, mc.residual_layers)

    def net(x, t_vec, c):
        return sequence_parallel_forward(
            mesh, params, x, t_vec, c, n_layers=mc.residual_layers,
            dilations=dil, max_steps=mc.timesteps, axis=axis, weights=w)

    # the conditioner (incl. inpainting masks and the generation spec:=-1
    # substitution) and the CFG step plumbing are the TASK's logic — shared
    # with the dense sampler, so the two paths cannot drift
    cond = task.build_conditioner(x_T, waveform=waveform)
    step = task.make_step_fn_from_net(net, cond)

    x_T = jax.device_put(x_T, NamedSharding(mesh, P(None, axis, None)))
    return sample_loop(step, x_T, cfg.timesteps, key,
                       steps=cfg.sampling_steps)
