"""Pallas TPU kernels for TRAINING the fused gated stack.

Two kernels (math derivation and XLA reference: ops/gated_stack_grad.py):

  * forward-with-saves — the sampling kernel (ops/gated_stack.py `_kernel`)
    with two extra per-layer outputs streamed to HBM: the layer inputs
    `xs` (L, B, T, C) and the pre-gate activations `a` (L, B, T, 2C), both
    bf16. Saving `a` avoids redoing the tap matmuls in backward (the
    dominant FLOPs) for one bf16 HBM round-trip.

  * backward — one reverse sweep over layers, grid (batch-tile, layer),
    with the dx carry accumulated in the revisited dx output block (the
    same consecutive-revisit pattern the forward uses for its skip
    accumulator). Weight grads are emitted PER BATCH TILE
    ((n_tiles, L, ...) outputs, summed in XLA afterwards) — cross-tile
    in-kernel accumulation would require revisiting non-consecutive
    output blocks, which Pallas does not guarantee to preserve.

Dilated-shift strategy: same circular-roll trick as the sampling kernel
(f32 `pltpu.roll` so every slice start is provably aligned); the backward
shift transpose is the same roll with the offset negated.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gated_stack import GatedStackWeights, _kernel, _pad_cond

_SQRT_HALF = 0.7071067811865476


def _pick_tile(bsz: int, cap: int) -> int:
    tile = min(bsz, cap)
    while tile > 1 and bsz % tile:
        tile -= 1
    return tile


# ------------------------------------------------------------ forward+saves

@functools.partial(jax.jit, static_argnames=("dilations", "interpret"))
def gated_stack_fwd_pallas(
    x: jnp.ndarray,
    t_bias: jnp.ndarray,
    cond: Optional[jnp.ndarray],
    w: GatedStackWeights,
    dilations: Tuple[int, ...],
    interpret: bool = False,
):
    """Returns (skip (B,T,C) f32, xs (L,B,T,C) bf16, a (L,B,T,2C) bf16)."""
    n_layers, taps, c, two_c = w.wd.shape
    bsz, t_len, _ = x.shape
    pad = (taps // 2) * max(dilations)
    conditional = cond is not None
    bf = jnp.bfloat16

    tile = _pick_tile(bsz, 4)
    n_tiles = bsz // tile

    operands = [x.astype(bf)]
    in_specs = [pl.BlockSpec((tile, t_len, c), lambda bi, i: (bi, 0, 0),
                             memory_space=pltpu.VMEM)]
    if conditional:
        m = w.wc.shape[1]
        operands.append(_pad_cond(cond, m).astype(bf))
        in_specs.append(pl.BlockSpec((tile, t_len, m),
                                     lambda bi, i: (bi, 0, 0),
                                     memory_space=pltpu.VMEM))
    operands.append(t_bias.astype(jnp.float32).reshape(
        n_layers, n_tiles, tile, c))
    in_specs.append(pl.BlockSpec((1, 1, tile, c), lambda bi, i: (i, bi, 0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(w.wd.astype(bf))
    in_specs.append(pl.BlockSpec((1, taps, c, two_c), lambda bi, i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM))
    if conditional:
        operands.append(w.wc.astype(bf))
        in_specs.append(pl.BlockSpec((1, w.wc.shape[1], two_c),
                                     lambda bi, i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    b_eff = w.b + w.bc if conditional else w.b
    operands.append(b_eff.astype(jnp.float32)[:, None, :])
    in_specs.append(pl.BlockSpec((1, 1, two_c), lambda bi, i: (i, 0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(w.wo.astype(bf))
    in_specs.append(pl.BlockSpec((1, c, two_c), lambda bi, i: (i, 0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(w.bo.astype(jnp.float32)[:, None, :])
    in_specs.append(pl.BlockSpec((1, 1, two_c), lambda bi, i: (i, 0, 0),
                                 memory_space=pltpu.VMEM))

    def kernel(*refs):
        if conditional:
            (x_ref, cond_ref, tb_ref, wd_ref, wc_ref, b_ref, wo_ref, bo_ref,
             out_ref, xs_ref, a_ref, x_buf, ypad) = refs
        else:
            (x_ref, tb_ref, wd_ref, b_ref, wo_ref, bo_ref,
             out_ref, xs_ref, a_ref, x_buf, ypad) = refs
            cond_ref = wc_ref = None
        _kernel(x_ref, cond_ref, tb_ref, wd_ref, wc_ref, b_ref,
                wo_ref, bo_ref, out_ref, x_buf, ypad,
                n_layers=n_layers, taps=taps, pad=pad,
                conditional=conditional, dilations=tuple(dilations),
                static_shifts=False, xs_ref=xs_ref, a_ref=a_ref)

    skip, xs, a_all = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_layers),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile, t_len, c), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, t_len, c), lambda bi, i: (i, bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, t_len, two_c), lambda bi, i: (i, bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, t_len, c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, bsz, t_len, c), bf),
            jax.ShapeDtypeStruct((n_layers, bsz, t_len, two_c), bf),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, t_len, c), bf),
            pltpu.VMEM((tile, t_len + 2 * pad, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    # xs/a are reshaped back to (L, B, T, .) by construction of the index
    # maps (block (i, bi) covers rows [bi*tile, (bi+1)*tile))
    return skip, xs, a_all


# ---------------------------------------------------------------- backward

def _bwd_kernel(
    xs_ref,        # (1, B, T, C) bf16   layer input
    a_ref,         # (1, B, T, 2C) bf16  pre-gate activations
    cond_ref,      # (B, T, M) bf16 or None
    tb_ref,        # (1, 1, B, C) f32
    wd_ref,        # (1, k, C, 2C) bf16
    wc_ref,        # (1, M, 2C) bf16 or None
    wo_ref,        # (1, C, 2C) bf16
    cot_ref,       # (B, T, C) f32 cotangent of the skip output
    dx_ref,        # out (B, T, C) f32 — the dx carry (revisited per layer)
    dtb_ref,       # out (1, 1, B, C) f32
    dwd_ref,       # out (1, 1, k, C, 2C) f32 (per batch tile)
    dwo_ref,       # out (1, 1, C, 2C) f32
    db_ref,        # out (1, 1, 1, 2C) f32
    dbo_ref,       # out (1, 1, 1, 2C) f32
    dwc_ref,       # out (1, 1, M, 2C) f32 or None
    dcond_ref,     # out (B, T, M) f32 or None (accumulated over layers)
    upad,          # scratch (B, T + 2*PAD, C) f32 — roll buffer
    *,
    n_layers: int,
    taps: int,
    pad: int,
    conditional: bool,
    dilations: tuple,
):
    j = pl.program_id(1)              # reversed layer step
    bsz, t_len, c = dx_ref.shape
    bf = jnp.bfloat16

    @pl.when(j == 0)
    def _init():
        dx_ref[:] = jnp.zeros_like(dx_ref)
        if conditional:
            dcond_ref[:] = jnp.zeros_like(dcond_ref)
        upad[:, :pad, :] = jnp.zeros((bsz, pad, c), upad.dtype)
        upad[:, t_len + pad:, :] = jnp.zeros((bsz, pad, c), upad.dtype)

    # layer index: grid step j processes layer L-1-j via the index maps;
    # in-kernel we only need its dilation, selected statically
    d_val = jnp.int32(dilations[0])
    for step in range(n_layers):
        d_val = jnp.where(j == step, jnp.int32(dilations[n_layers - 1 - step]),
                          d_val)

    dskip = cot_ref[:] * (1.0 / math.sqrt(n_layers))
    dx = dx_ref[:]
    dout = jnp.concatenate([dx * _SQRT_HALF, dskip], axis=-1)  # (B,T,2C) f32
    dout16 = dout.astype(bf)

    a = a_ref[0].astype(jnp.float32)
    s1 = jax.nn.sigmoid(a[..., :c])
    th = jnp.tanh(a[..., c:])
    g = (s1 * th).astype(bf)

    def contract_bt(lhs, rhs):
        # (B,T,P) x (B,T,Q) -> (P,Q): merge (B,T) and contract dim 0
        p, q = lhs.shape[-1], rhs.shape[-1]
        return jax.lax.dot_general(
            lhs.reshape(bsz * t_len, p), rhs.reshape(bsz * t_len, q),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dwo_ref[0, 0] = contract_bt(g, dout16)
    dbo_ref[0, 0, 0] = jnp.sum(dout, axis=(0, 1))
    # dg = dout @ wo^T : contract the 2C dim
    dg = jax.lax.dot_general(
        dout16, wo_ref[0],
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, T, C)

    da = jnp.concatenate(
        [dg * th * s1 * (1.0 - s1), dg * s1 * (1.0 - th * th)], axis=-1)
    da16 = da.astype(bf)
    db_ref[0, 0, 0] = jnp.sum(da, axis=(0, 1))
    if conditional:
        dwc_ref[0, 0] = contract_bt(cond_ref[:], da16)
        dcond_ref[:] = dcond_ref[:] + jax.lax.dot_general(
            da16, wc_ref[0],
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # y = x_i + tb_i, recomputed from the saves; lives in the roll buffer
    y = xs_ref[0].astype(jnp.float32) + tb_ref[0, 0][:, None, :]
    upad[:, pad: t_len + pad, :] = y
    t_padded = t_len + 2 * pad
    ctr = taps // 2

    # dWd_j = shift_j(y)^T da (forward shifts of y)
    dwd_taps = []
    for t in range(taps):
        if t == ctr:
            shifted = upad[:, pad: pad + t_len, :].astype(bf)
        else:
            off = (t - ctr) * d_val
            rolled = pltpu.roll(upad[:], t_padded - pad - off, axis=1)
            shifted = rolled[:, :t_len, :].astype(bf)
        dwd_taps.append(contract_bt(shifted, da16))
    dwd_ref[0, 0] = jnp.stack(dwd_taps)

    # dy = sum_j shift_{-j}(da @ Wd_j^T) (transposed shifts)
    dy = jnp.zeros((bsz, t_len, c), jnp.float32)
    for t in range(taps):
        u = jax.lax.dot_general(
            da16, wd_ref[0, t],
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, T, C)
        if t == ctr:
            dy = dy + u
        else:
            off = (t - ctr) * d_val
            upad[:, pad: t_len + pad, :] = u
            rolled = pltpu.roll(upad[:], t_padded - pad + off, axis=1)
            dy = dy + rolled[:, :t_len, :]

    dtb_ref[0, 0] = jnp.sum(dy, axis=1)
    dx_ref[:] = dx * _SQRT_HALF + dy


@functools.partial(jax.jit, static_argnames=("dilations", "interpret"))
def _bwd_pallas_call(dilations, t_bias, cond, w, xs, a_all, cot,
                     interpret=False):
    n_layers, taps, c, two_c = w.wd.shape
    bsz, t_len, _ = cot.shape
    pad = (taps // 2) * max(dilations)
    conditional = cond is not None
    bf = jnp.bfloat16

    # backward keeps more live blocks than forward; cap the tile lower
    tile = _pick_tile(bsz, 2)
    n_tiles = bsz // tile

    operands = [xs, a_all]
    in_specs = [
        pl.BlockSpec((1, tile, t_len, c), lambda bi, j: (n_layers - 1 - j, bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, t_len, two_c),
                     lambda bi, j: (n_layers - 1 - j, bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    m = w.wc.shape[1] if conditional else 0
    if conditional:
        operands.append(_pad_cond(cond, m).astype(bf))
        in_specs.append(pl.BlockSpec((tile, t_len, m),
                                     lambda bi, j: (bi, 0, 0),
                                     memory_space=pltpu.VMEM))
    operands.append(t_bias.astype(jnp.float32).reshape(
        n_layers, n_tiles, tile, c))
    in_specs.append(pl.BlockSpec(
        (1, 1, tile, c), lambda bi, j: (n_layers - 1 - j, bi, 0, 0),
        memory_space=pltpu.VMEM))
    operands.append(w.wd.astype(bf))
    in_specs.append(pl.BlockSpec(
        (1, taps, c, two_c), lambda bi, j: (n_layers - 1 - j, 0, 0, 0),
        memory_space=pltpu.VMEM))
    if conditional:
        operands.append(w.wc.astype(bf))
        in_specs.append(pl.BlockSpec(
            (1, m, two_c), lambda bi, j: (n_layers - 1 - j, 0, 0),
            memory_space=pltpu.VMEM))
    operands.append(w.wo.astype(bf))
    in_specs.append(pl.BlockSpec(
        (1, c, two_c), lambda bi, j: (n_layers - 1 - j, 0, 0),
        memory_space=pltpu.VMEM))
    operands.append(cot.astype(jnp.float32))
    in_specs.append(pl.BlockSpec((tile, t_len, c), lambda bi, j: (bi, 0, 0),
                                 memory_space=pltpu.VMEM))

    out_specs = [
        pl.BlockSpec((tile, t_len, c), lambda bi, j: (bi, 0, 0),
                     memory_space=pltpu.VMEM),                        # dx
        pl.BlockSpec((1, 1, tile, c),
                     lambda bi, j: (n_layers - 1 - j, bi, 0, 0),
                     memory_space=pltpu.VMEM),                        # dtb
        pl.BlockSpec((1, 1, taps, c, two_c),
                     lambda bi, j: (bi, n_layers - 1 - j, 0, 0, 0),
                     memory_space=pltpu.VMEM),                        # dwd
        pl.BlockSpec((1, 1, c, two_c),
                     lambda bi, j: (bi, n_layers - 1 - j, 0, 0),
                     memory_space=pltpu.VMEM),                        # dwo
        pl.BlockSpec((1, 1, 1, two_c),
                     lambda bi, j: (bi, n_layers - 1 - j, 0, 0),
                     memory_space=pltpu.VMEM),                        # db
        pl.BlockSpec((1, 1, 1, two_c),
                     lambda bi, j: (bi, n_layers - 1 - j, 0, 0),
                     memory_space=pltpu.VMEM),                        # dbo
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, t_len, c), jnp.float32),
        jax.ShapeDtypeStruct((n_layers, n_tiles, tile, c), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, n_layers, taps, c, two_c), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, n_layers, c, two_c), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, n_layers, 1, two_c), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, n_layers, 1, two_c), jnp.float32),
    ]
    if conditional:
        out_specs.append(pl.BlockSpec(
            (1, 1, m, two_c), lambda bi, j: (bi, n_layers - 1 - j, 0, 0),
            memory_space=pltpu.VMEM))                                 # dwc
        out_shape.append(jax.ShapeDtypeStruct(
            (n_tiles, n_layers, m, two_c), jnp.float32))
        out_specs.append(pl.BlockSpec((tile, t_len, m),
                                      lambda bi, j: (bi, 0, 0),
                                      memory_space=pltpu.VMEM))       # dcond
        out_shape.append(jax.ShapeDtypeStruct((bsz, t_len, m), jnp.float32))

    def kernel(*refs):
        if conditional:
            (xs_ref, a_ref, cond_ref, tb_ref, wd_ref, wc_ref, wo_ref, cot_ref,
             dx_ref, dtb_ref, dwd_ref, dwo_ref, db_ref, dbo_ref,
             dwc_ref, dcond_ref, upad) = refs
        else:
            (xs_ref, a_ref, tb_ref, wd_ref, wo_ref, cot_ref,
             dx_ref, dtb_ref, dwd_ref, dwo_ref, db_ref, dbo_ref,
             upad) = refs
            cond_ref = wc_ref = dwc_ref = dcond_ref = None
        _bwd_kernel(xs_ref, a_ref, cond_ref, tb_ref, wd_ref, wc_ref, wo_ref,
                    cot_ref, dx_ref, dtb_ref, dwd_ref, dwo_ref, db_ref,
                    dbo_ref, dwc_ref, dcond_ref, upad,
                    n_layers=n_layers, taps=taps, pad=pad,
                    conditional=conditional, dilations=tuple(dilations))

    return pl.pallas_call(
        kernel,
        grid=(n_tiles, n_layers),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tile, t_len + 2 * pad, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


def gated_stack_bwd_pallas(dilations, saves, cot, interpret: bool = False):
    """VJP backward on TPU. `saves` from `_vjp_fwd`; returns
    (dx, dt_bias, dcond, dGatedStackWeights)."""
    _, t_bias, cond, w, xs, a_all = saves
    n_layers = w.wd.shape[0]
    outs = _bwd_pallas_call(tuple(dilations), t_bias, cond, w, xs, a_all,
                            cot, interpret=interpret)
    if cond is not None:
        dx, dtb, dwd, dwo, db, dbo, dwc, dcond_p = outs
        dwc_s = dwc.sum(0)
        dcond = dcond_p[:, :, : cond.shape[-1]]
    else:
        dx, dtb, dwd, dwo, db, dbo = outs
        dwc_s = dcond = None
    db_s = db.sum(0)[:, 0, :]
    dw = GatedStackWeights(
        wd=dwd.sum(0), wc=dwc_s, wo=dwo.sum(0), b=db_s,
        bc=db_s if cond is not None else None,
        bo=dbo.sum(0)[:, 0, :],
        wt=jnp.zeros_like(w.wt), bt=jnp.zeros_like(w.bt),
    )
    dtb_full = dtb.reshape(n_layers, -1, dtb.shape[-1])
    return dx, dtb_full, dcond, dw
