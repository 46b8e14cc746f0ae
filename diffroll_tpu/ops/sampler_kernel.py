"""The whole reverse-diffusion process as ONE Pallas kernel.

The scan-fused sampler (diffusion/loop.py) already eliminated host syncs,
but it still streams every layer's weights HBM->VMEM once per step:
~63 MB of bf16 weights x 200 steps = ~12.6 GB of HBM traffic for a single
20.48 s clip, which dominates per-step latency at small batch. This kernel
inverts the loop: the grid is (batch_tiles, n_steps), ALL weights (stack +
head + conditioner projections) are VMEM-resident constant-index blocks
fetched once, and each grid step runs the full denoiser + sampler update
in place.

Two observations make this tractable:

  1. Every reference sampler step is LINEAR in (prediction, x, noise):
        x <- a[i] * pred + b[i] * x + s[i] * noise_i
     with per-step scalars precomputable from the schedule
     (`sampler_tables`, covering the x0- and epsilon-parameterisations and
     the t_prev=-1 final-step branches, reference task/diffusion.py:
     804-1055). The tables ride in SMEM.
  2. With the layer loop UNROLLED in the kernel body (the grid iterates
     steps, not layers), each layer's dilation is a compile-time constant,
     so the dilated taps are plain static slices of a zero-haloed buffer —
     no dynamic rolls at all.

Classifier-free guidance runs both branches as rows of one 2*tile batch
(the conditioner is laid out per tile as [tile cond rows; tile uncond
rows] outside) and mixes (1+w) c - w u in-kernel.

Noise parity: `jax.random.split(key, n)` + one `normal(k, x.shape)` per
step reproduces diffusion/loop.py's draws exactly, so this kernel is
bit-comparable (up to matmul precision) to the scan path it replaces.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..diffusion.schedule import Schedule
from .gated_stack import GatedStackWeights, _pad_cond

_SQRT_HALF = 0.7071067811865476


# --------------------------------------------------------------- the tables

def sampler_tables(
    schedule: Schedule,
    sampler_type: str,
    ts: np.ndarray,
    ts_prev: np.ndarray,
) -> np.ndarray:
    """Per-step (a, b, s) for `x <- a*pred + b*x + s*noise`.

    Covers all nine reference samplers (x0- and epsilon-parameterised,
    stochastic and deterministic, incl. the reference's t==0 branches).
    Returns (n, 3) float32.
    """
    sac = np.asarray(schedule.sqrt_alphas_cumprod, np.float64)
    s1m = np.asarray(schedule.sqrt_one_minus_alphas_cumprod, np.float64)
    src = np.asarray(schedule.sqrt_recip_alphas, np.float64)
    betas = np.asarray(schedule.betas, np.float64)

    t = np.asarray(ts, np.int64)
    tp_raw = np.asarray(ts_prev, np.int64)
    done = tp_raw < 0
    tp = np.maximum(tp_raw, 0)

    # generalized ancestral sigma (== sqrt(posterior_variance) for tp==t-1)
    alpha_ratio = (sac[t] / sac[tp]) ** 2
    sigma_ddpm = (s1m[tp] / s1m[t]) * np.sqrt(np.maximum(1.0 - alpha_ratio, 0.0))

    base = sampler_type[5:] if sampler_type.startswith("cfdg_") else sampler_type
    for prefix in ("generation_", "inpainting_"):
        if base.startswith(prefix):
            base = base[len(prefix):]

    if base in ("ddpm_x0", "ddim_x0"):
        sigma = sigma_ddpm if base == "ddpm_x0" else np.zeros_like(sigma_ddpm)
        c_dir = np.sqrt(np.maximum(1.0 - sac[tp] ** 2 - sigma**2, 0.0)) / s1m[t]
        a = sac[tp] - c_dir * sac[t]
        b = c_dir
        s = sigma
        a_done, b_done = 1.0 / sac[0], 0.0
    elif base in ("ddpm", "ddim", "ddim2ddpm"):
        # epsilon parameterisation: x0 = (x - s1m[t] eps) / sac[t]
        sigma = np.zeros_like(sigma_ddpm) if base == "ddim" else sigma_ddpm
        if base == "ddim":
            c_eps = s1m[tp]
        else:
            c_eps = np.sqrt(np.maximum(1.0 - sac[tp] ** 2 - sigma**2, 0.0))
        b = sac[tp] / sac[t]
        a = c_eps - b * s1m[t]
        s = sigma
        if base == "ddpm":
            # reference t==0 branch: deterministic posterior mean
            # (task/diffusion.py:846-852)
            a_done = -src[t[-1]] * betas[t[-1]] / s1m[t[-1]]
            b_done = src[t[-1]]
        else:
            # x0 recovery: (x - s1m eps)/sac at the final visited t
            a_done = -s1m[t[-1]] / sac[t[-1]]
            b_done = 1.0 / sac[t[-1]]
    else:
        raise KeyError(f"no linear tables for sampler {sampler_type!r}")

    a = np.where(done, a_done, a)
    b = np.where(done, b_done, b)
    s = np.where(done, 0.0, s)
    return np.stack([a, b, s], axis=1).astype(np.float32)


class HeadWeights(NamedTuple):
    """The non-stack weights of DiffRollNet (1x1 conv heads), f32."""

    win: jnp.ndarray   # (88, C)  input_projection
    bin: jnp.ndarray   # (C,)
    wskip: jnp.ndarray  # (C, C)  skip_projection
    bskip: jnp.ndarray  # (C,)
    wout: jnp.ndarray  # (C, 88) output_projection (zero-init head)
    bout: jnp.ndarray  # (88,)


def head_weights(params) -> HeadWeights:
    p = params["params"] if "params" in params else params
    return HeadWeights(
        win=p["input_projection"]["kernel"][0],
        bin=p["input_projection"]["bias"],
        wskip=p["skip_projection"]["kernel"][0],
        bskip=p["skip_projection"]["bias"],
        wout=p["output_projection"]["kernel"][0],
        bout=p["output_projection"]["bias"],
    )


# --------------------------------------------------------------- the kernel

def _dot2d(lhs, rhs):
    return jax.lax.dot_general(
        lhs, rhs,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _make_kernel(n_layers, taps, dilations, pad, guided, w_guidance,
                 tile, t_len, c, conditional, stochastic,
                 merge_taps, hoist_cond, u, diag=""):
    """Kernel body. Block shapes (leading 1s are the grid block axes):
    x_T (1,tile,T,88) f32; noise (1,1,tile,T,88) f32; tb (1,L,C) f32;
    tab (1,3) SMEM f32; stack/head weights full-array resident;
    cond (1, bc, T, M) bf16; out x (1,tile,T,88) f32 (the carry).

    All dots flatten the stream dim into matmul rows ((bc*T, K) x (K, N)):
    at small batch the per-step cost is latency-dominated (measured
    t(bc) = 174us + 238us*bc per 200-step CFG run on v5e), so fewer,
    larger MXU ops beat per-stream rank-3 dots. `merge_taps` concatenates
    the tap slices along channels for ONE (bc*T, taps*C) x (taps*C, 2C)
    dot per layer; `hoist_cond` computes the step-invariant conditioner
    projection (cond @ wc_l + b_l, identical for all 200 steps) once at
    i==0 into a resident scratch, removing 15 dots from every later step.
    `u` unrolls that many reverse steps per grid iteration: grid-step
    machinery costs ~180us on v5e regardless of denoiser size (a 2-layer
    full-width step still takes 240us), which is ~30% of the B=1 step —
    unrolling amortizes it over u real steps.
    """
    ctr = taps // 2
    bc = 2 * tile if guided else tile
    rows = bc * t_len          # flattened matmul rows
    grows = tile * t_len       # rows per guidance stream
    bf = jnp.bfloat16
    # `diag` ablates named kernel pieces for latency attribution (output
    # becomes garbage — tools/profile_megakernel.py only): tokens among
    # nohead,nofinal,noupdate,noypad,noskip,notb,nogate. Non-garbage
    # experiment tokens (valid output, measured on the B=1 CFG e2e,
    # PROFILE_r03.md): nowosplit (single-dot out projection, +0.9 ms),
    # chunkbc/chunkt2/chunkt4 (per-stream/per-frame-chunk splits,
    # neutral), gateexp (exp+approx-reciprocal gate, SLOWER — the exps
    # are the cost), gatebf16 (bf16 gate, Mosaic verification error).
    diag = frozenset(diag.split(",")) if diag else frozenset()

    def kernel(*refs):
        (x_T_ref, noise_ref, tb_ref, tab_ref,
         wd_ref, wc_ref, b_ref, wo_ref, bo_ref,
         win_ref, bin_ref, wskip_ref, bskip_ref, wout_ref, bout_ref,
         cond_ref, x_ref, x_buf, ypad) = refs[:19]
        cond_scr = refs[19] if hoist_cond else None
        i = pl.program_id(1)  # step; dim 0 tiles the batch

        @pl.when(i == 0)
        def _init():
            x_ref[0] = x_T_ref[0]
            if pad:
                ypad[:, :pad, :] = jnp.zeros((bc, pad, c), ypad.dtype)
                ypad[:, t_len + pad:, :] = jnp.zeros((bc, pad, c), ypad.dtype)
            if hoist_cond:
                cflat = cond_ref[0].reshape(rows, -1)
                for l in range(n_layers):
                    cond_scr[l] = (_dot2d(cflat, wc_ref[l])
                                   + b_ref[l, 0][None, :]).astype(bf)

        x = x_ref[0]  # (tile, T, 88) f32
        for uu in range(u):  # u reverse steps per grid iteration

            # head-in (f32 dots: tiny, keeps parity with the XLA head)
            if "nohead" in diag:
                x_buf[:] = jnp.zeros((rows, c), bf)
            else:
                h = jax.nn.relu(
                    _dot2d(x.reshape(grows, -1), win_ref[:])
                    + bin_ref[0][None, :])
                if guided:
                    x_buf[:] = jnp.concatenate([h, h], axis=0).astype(bf)
                else:
                    x_buf[:] = h.astype(bf)

            # `chunkbc` splits the stack into per-stream row chunks so each
            # guidance stream's layer chain is independent until the skip
            # merge, in principle letting Mosaic overlap one stream's VPU
            # gate with the other's MXU dots — measured NEUTRAL at B=1 CFG
            # (0.1193 vs 0.1186 s; Mosaic already overlaps), kept for A/Bs.
            # `chunkt2`/`chunkt4` additionally split each stream's frames
            # into 2/4 sub-chunks (ypad is written whole per stream first,
            # because dilated taps cross sub-chunk boundaries).
            chunk_bc = ("chunkbc" in diag and bc > 1)
            nch_t = 2 if "chunkt2" in diag else 4 if "chunkt4" in diag else 1
            if nch_t > 1:
                chunk_bc = bc > 1  # t-split implies the per-stream split
            # chunk descriptors: (row0, nrows, stream0, nstreams, t0)
            if chunk_bc or nch_t > 1:
                ct = t_len // nch_t
                chunks = [(b * t_len + kt * ct, ct, b, 1, kt * ct)
                          for b in range(bc) for kt in range(nch_t)]
            else:
                chunks = [(0, rows, 0, bc, 0)]

            def gate(acc):
                if "nogate" in diag:
                    return acc[:, :c].astype(bf)
                if "gatebf16" in diag:
                    # packed-bf16 VPU transcendentals (2 lanes/word)
                    ab = acc.astype(bf)
                    return jax.nn.sigmoid(ab[:, :c]) * jnp.tanh(ab[:, c:])
                if "gateexp" in diag:
                    # 2 exps + 2 fast reciprocals instead of library
                    # sigmoid/tanh: s(a)*tanh(b) with tanh(b)=2s(2b)-1
                    ea = jnp.exp(-acc[:, :c])
                    e2b = jnp.exp(-2.0 * acc[:, c:])
                    s = pl.reciprocal(1.0 + ea, approx=True)
                    th = 2.0 * pl.reciprocal(1.0 + e2b, approx=True) - 1.0
                    return (s * th).astype(bf)
                return (jax.nn.sigmoid(acc[:, :c]) * jnp.tanh(acc[:, c:])
                        ).astype(bf)

            # The out projection runs as two half-dots so the skip half
            # accumulates straight into the running skip (MXU accumulation
            # instead of 15 VMEM round-trips of a (rows, C) f32
            # accumulator); the skip bias is then added once after the
            # layer loop (f32 reorder only). Measured 0.1177 vs 0.1186 s
            # on the B=1 CFG 200-step e2e — the DEFAULT; `nowosplit`
            # restores the single-dot path for A/Bs.
            wosplit = "nowosplit" not in diag
            chunked = len(chunks) > 1

            skips = [jnp.zeros((ch[1], c), jnp.float32) for ch in chunks]
            for l in range(n_layers):
                d = int(dilations[l])
                # write each stream's ypad interior WHOLE before any
                # sub-chunk reads it: dilated taps cross t-splits
                if "noypad" not in diag:
                    if chunked:
                        for b in range(bc):
                            r0 = b * t_len
                            y = x_buf[r0: r0 + t_len].astype(jnp.float32)
                            if "notb" not in diag:
                                y = y + tb_ref[uu, l][None, :]
                            ypad[b, pad: t_len + pad, :] = (
                                y.astype(ypad.dtype))
                    else:
                        y = x_buf[:].astype(jnp.float32)
                        if "notb" not in diag:
                            y = y + tb_ref[uu, l][None, :]
                        ypad[:, pad: t_len + pad, :] = (
                            y.reshape(bc, t_len, c).astype(ypad.dtype))
                for k, (r0, csz, b0, bn, t0) in enumerate(chunks):
                    tl = csz // bn
                    if hoist_cond:
                        acc = cond_scr[l, r0: r0 + csz].astype(jnp.float32)
                    else:
                        acc = jnp.broadcast_to(
                            b_ref[l, 0][None, :],
                            (csz, 2 * c)).astype(jnp.float32)
                        if conditional:
                            acc = acc + _dot2d(
                                cond_ref[0].reshape(rows, -1)[r0: r0 + csz],
                                wc_ref[l])
                    # dilated taps: static slices of the zero-haloed buffer
                    # (dilation is compile-time-constant per unrolled layer)
                    if merge_taps:
                        yc = jnp.concatenate(
                            [ypad[b0: b0 + bn, pad + t0 + (j - ctr) * d:
                                  pad + t0 + (j - ctr) * d + tl, :]
                             .reshape(csz, c) for j in range(taps)], axis=-1)
                        acc = acc + _dot2d(
                            yc, wd_ref[l].reshape(taps * c, 2 * c))
                    else:
                        for j in range(taps):
                            start = pad + t0 + (j - ctr) * d
                            acc = acc + _dot2d(
                                ypad[b0: b0 + bn, start: start + tl, :]
                                .reshape(csz, c),
                                wd_ref[l, j])
                    g = gate(acc)
                    if wosplit:
                        out_x = (_dot2d(g, wo_ref[l, :, :c])
                                 + bo_ref[l, 0, :c][None, :])
                        if "noskip" not in diag:
                            skips[k] = skips[k] + _dot2d(g, wo_ref[l, :, c:])
                    else:
                        out = _dot2d(g, wo_ref[l]) + bo_ref[l, 0][None, :]
                        out_x = out[:, :c]
                        if "noskip" not in diag:
                            skips[k] = skips[k] + out[:, c:]
                    x_buf[r0: r0 + csz] = (
                        (x_buf[r0: r0 + csz].astype(jnp.float32)
                         + out_x) * _SQRT_HALF).astype(bf)
            skip = (skips[0] if not chunked
                    else jnp.concatenate(skips, axis=0))
            if wosplit and "noskip" not in diag:
                # deferred skip bias: the per-layer sum added once
                skip = skip + jnp.sum(bo_ref[:, 0, c:], axis=0)[None, :]

            if "nofinal" in diag:
                pred = skip[:, : x.shape[2]]
            else:
                skip = skip * (1.0 / math.sqrt(n_layers))
                hs = jax.nn.relu(_dot2d(skip, wskip_ref[:])
                                 + bskip_ref[0][None, :])
                pred = _dot2d(hs, wout_ref[:]) + bout_ref[0][None, :]

            if guided:
                pred = ((1.0 + w_guidance) * pred[:grows]
                        - w_guidance * pred[grows:])

            # tables are a fully-resident (n, 3) SMEM block; scalar-indexed
            # by the step id (a (1, 3) block fails Mosaic's divisibility
            # rule); with u>1 the absolute step is i*u + uu
            if "noupdate" in diag:
                x = x + pred.reshape(x.shape) * 1e-6
            else:
                s = i * u + uu
                a = tab_ref[s, 0]
                b = tab_ref[s, 1]
                upd = a * pred.reshape(x.shape) + b * x
                if stochastic:  # deterministic: dummy (1,..) noise operand
                    upd = upd + tab_ref[s, 2] * noise_ref[uu, 0]
                x = upd
        x_ref[0] = x

    return kernel


def _pick_tile(bsz: int, guided: bool) -> int:
    """Largest batch tile whose activations fit beside the resident
    weights (the (bc, T, 2C) f32 pre-gate intermediate is the driver)."""
    cap = 2 if guided else 4
    tile = min(bsz, cap)
    while tile > 1 and bsz % tile:
        tile -= 1
    return tile


@functools.partial(
    jax.jit,
    static_argnames=("dilations", "guided", "w_guidance", "stochastic",
                     "merge_taps", "hoist_cond", "steps_per_block",
                     "diag", "interpret"))
def fused_sample_pallas(
    x_T: jnp.ndarray,                 # (B, T, 88) f32
    noise: jnp.ndarray,               # (n, B, T, 88) f32; (1, B, T, 88)
                                      # dummy when stochastic=False
    t_bias: jnp.ndarray,              # (n, L, C) f32 per-step FiLM biases
    tables: jnp.ndarray,              # (n, 3) f32 from sampler_tables
    w: GatedStackWeights,
    head: HeadWeights,
    cond: Optional[jnp.ndarray],      # (B, T, M) raw conditioner, or None
    dilations: Tuple[int, ...],
    guided: bool,
    w_guidance: float = 0.0,
    stochastic: bool = True,
    merge_taps: bool = False,
    hoist_cond: Optional[bool] = None,
    steps_per_block: Optional[int] = None,
    diag: str = "",
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the whole reverse process; returns x_0 (B, T, 88) f32.

    `cond` is the CONDITIONAL branch's conditioner; the guided layout
    ([tile cond rows; tile of -1 rows] per batch tile) is built here.
    `hoist_cond=None` auto-enables the one-time conditioner-projection
    precompute whenever its (L, bc*T, 2C) bf16 scratch fits in VMEM next
    to the resident weights (small-batch tiles; at the flagship size the
    bc=4 serving tile would need ~79 MB and stays on the per-step path).
    `steps_per_block=None` auto-unrolls up to 4 reverse steps per grid
    iteration at small batch (the ~180us/grid-step machinery cost is
    ~30% of a B=1 step; at bc>4 it is already amortized by compute).
    `merge_taps` measured neutral-to-negative and trips a Mosaic internal
    error at bc==1 — kept as an off-by-default experiment knob.
    """
    n_steps = tables.shape[0]
    n_layers, taps, c, two_c = w.wd.shape
    bsz, t_len, n_out = x_T.shape
    pad = (taps // 2) * max(dilations)
    conditional = cond is not None and w.wc is not None
    bf = jnp.bfloat16

    tile = _pick_tile(bsz, guided)
    n_tiles = bsz // tile
    bc = 2 * tile if guided else tile

    if hoist_cond is None:
        # NUMERICS CAVEAT: the hoisted path rounds the per-layer
        # conditioner projection (+bias) to bf16 ONCE in scratch, whereas
        # the per-step path accumulates the bias in f32 every step — and
        # because this auto-enable is a VMEM-SIZE heuristic, the same
        # checkpoint can produce slightly different trajectories across
        # model sizes / batch tiles. Bit-level A/B comparisons must pin
        # `hoist_cond` explicitly; parity tests bound the drift at 5% rel.
        # resident weights (bf16 stack + f32 heads/biases) + the scratch
        # + ~14 MB for blocks/activation temporaries must fit in 127 MB
        # (measured: the flagship guided bc=2 tile fits and wins ~9%;
        # bc=4 overflows and fails to compile, so it must stay off)
        wbytes = 2 * (w.wd.size + w.wo.size
                      + (w.wc.size if conditional else 0))
        wbytes += 4 * (head.win.size + head.wskip.size + head.wout.size
                       + 2 * n_layers * c + two_c * n_layers + 3 * c + n_out)
        scr = 2 * n_layers * bc * t_len * two_c
        hoist_cond = bool(conditional
                          and wbytes + scr + 14 * 2**20 <= 127 * 2**20)
    hoist_cond = bool(hoist_cond and conditional)

    if steps_per_block is None:
        u = 1
        if bc <= 4:
            for cand in (4, 2):
                if n_steps % cand == 0:
                    u = cand
                    break
    else:
        u = int(steps_per_block)
        if n_steps % u:
            raise ValueError(f"steps_per_block={u} must divide {n_steps}")

    if conditional:
        m = w.wc.shape[1]
        cond_p = _pad_cond(cond, m).astype(bf)
        cond_t = cond_p.reshape(n_tiles, tile, t_len, m)
        if guided:
            uncond = jnp.full_like(cond_t, -1.0)
            # zero the padding lanes of the uncond rows too (pad stays 0)
            if m > cond.shape[-1]:
                uncond = uncond.at[..., cond.shape[-1]:].set(0.0)
            cond_t = jnp.concatenate([cond_t, uncond], axis=1)  # (nt, bc, T, M)
    else:
        m = 128
        cond_t = jnp.zeros((n_tiles, bc, 8, m), bf)  # dummy, never read

    const = lambda rank: (lambda bi, i: (0,) * rank)  # resident: one fetch

    operands = [
        x_T.astype(jnp.float32).reshape(n_tiles, tile, t_len, n_out),
        noise.astype(jnp.float32).reshape(noise.shape[0], n_tiles, tile,
                                          t_len, n_out),
        t_bias.astype(jnp.float32),
        tables.astype(jnp.float32),
        w.wd.astype(bf),
        (w.wc.astype(bf) if conditional
         else jnp.zeros((n_layers, m, two_c), bf)),
        ((w.b + w.bc if conditional else w.b)
         .astype(jnp.float32)[:, None, :]),
        w.wo.astype(bf),
        w.bo.astype(jnp.float32)[:, None, :],
        head.win.astype(jnp.float32),
        head.bin.astype(jnp.float32)[None, :],
        head.wskip.astype(jnp.float32),
        head.bskip.astype(jnp.float32)[None, :],
        head.wout.astype(jnp.float32),
        head.bout.astype(jnp.float32)[None, :],
        cond_t,
    ]
    in_specs = [
        pl.BlockSpec((1, tile, t_len, n_out), lambda bi, i: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((u if stochastic else 1, 1, tile, t_len, n_out),
                     (lambda bi, i: (i, bi, 0, 0, 0)) if stochastic
                     else (lambda bi, i: (0, bi, 0, 0, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((u, n_layers, c), lambda bi, i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(operands[3].shape, const(2), memory_space=pltpu.SMEM),
        pl.BlockSpec(operands[4].shape, const(4), memory_space=pltpu.VMEM),
        pl.BlockSpec(operands[5].shape, const(3), memory_space=pltpu.VMEM),
        pl.BlockSpec(operands[6].shape, const(3), memory_space=pltpu.VMEM),
        pl.BlockSpec(operands[7].shape, const(3), memory_space=pltpu.VMEM),
        pl.BlockSpec(operands[8].shape, const(3), memory_space=pltpu.VMEM),
        pl.BlockSpec(operands[9].shape, const(2), memory_space=pltpu.VMEM),
        pl.BlockSpec(operands[10].shape, const(2), memory_space=pltpu.VMEM),
        pl.BlockSpec(operands[11].shape, const(2), memory_space=pltpu.VMEM),
        pl.BlockSpec(operands[12].shape, const(2), memory_space=pltpu.VMEM),
        pl.BlockSpec(operands[13].shape, const(2), memory_space=pltpu.VMEM),
        pl.BlockSpec(operands[14].shape, const(2), memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + cond_t.shape[1:], lambda bi, i: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    kernel = _make_kernel(n_layers, taps, tuple(dilations), pad, guided,
                          float(w_guidance), tile, t_len, c, conditional,
                          stochastic, merge_taps, hoist_cond, u, diag)

    scratch = [
        pltpu.VMEM((bc * t_len, c), bf),
        pltpu.VMEM((bc, t_len + 2 * pad, c), bf),
    ]
    if hoist_cond:
        scratch.append(pltpu.VMEM((n_layers, bc * t_len, two_c), bf))

    x0 = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_steps // u),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, t_len, n_out),
                               lambda bi, i: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, tile, t_len, n_out),
                                       jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(127 if hoist_cond else 120) * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return x0.reshape(bsz, t_len, n_out)
