"""Trainable fused gated stack: custom VJP for `ops.gated_stack`.

`pallas_call` has no automatic differentiation, so round 1 kept training on
the per-layer flax path (reference semantics: model/diffwave.py:107-151).
This module gives the fused stack an explicit VJP so TRAINING can also run
one kernel per step:

  forward:  the gated stack, additionally saving per-layer residuals —
            xs (L, B, T, C)  layer inputs, and
            a  (L, B, T, 2C) pre-gate activations
            (saving `a` instead of recomputing it in backward trades
            ~2x the tap-matmul FLOPs for one HBM round-trip of bf16
            activations — the cheaper side on v5e, where the tap matmuls
            are the dominant cost).
  backward: one reverse sweep over layers producing grads for x, t_bias,
            cond and every stacked weight. Layer math (forward in
            ops/gated_stack.py docstring):

              y   = x_i + tb_i
              a   = sum_j shift_j(y) @ Wd_j + cond @ Wc + b        (+ bc)
              g   = sigmoid(a_1) * tanh(a_2)
              out = g @ Wo + bo;  r, s = out[:C], out[C:]
              x_{i+1} = (x_i + r)/sqrt(2);  skip += s

            cotangents (dskip = cot_out / sqrt(L), dx carried in reverse):

              dout   = [dx_{i+1}/sqrt(2), dskip]
              dWo    = g^T dout;        dbo = sum dout
              dg     = dout Wo^T
              da     = [dg * tanh(a_2) * s1(1-s1), dg * s1 * (1-tanh^2(a_2))]
              db     = sum da           (dbc = db when conditional)
              dWc    = cond^T da;       dcond += da Wc^T
              dWd_j  = shift_j(y)^T da; dy = sum_j shift_{-j}(da Wd_j^T)
              dtb_i  = sum_T dy
              dx_i   = dx_{i+1}/sqrt(2) + dy

The XLA implementation below is the semantic reference (validated against
jax.grad of `gated_stack_xla` in tests/test_ops_grad.py); the Pallas
forward/backward kernels mirror it for the TPU training path.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .gated_stack import GatedStackWeights, _pad_cond

_SQRT_HALF = 0.7071067811865476


def _shift(arr: jnp.ndarray, off: int) -> jnp.ndarray:
    """Zero-padded time shift: out[t] = arr[t + off] (axis 1)."""
    if off < 0:
        return jnp.pad(arr[:, : off or None], ((0, 0), (-off, 0), (0, 0)))
    if off > 0:
        return jnp.pad(arr[:, off:], ((0, 0), (0, off), (0, 0)))
    return arr


# ----------------------------------------------------------------- XLA fwd

def _fwd_saves_xla(x, t_bias, cond, w: GatedStackWeights, dilations):
    """Forward identical to `gated_stack_xla`, returning (skip, xs, a)."""
    n_layers, k = w.wd.shape[0], w.wd.shape[1]
    ctr = k // 2
    skip_sum = jnp.zeros_like(x)
    cond_terms = None
    if cond is not None:
        cond_p = _pad_cond(cond, w.wc.shape[1])
        cond_terms = jnp.einsum("btm,lmc->lbtc", cond_p, w.wc)

    xs, a_all = [], []
    for i in range(n_layers):
        d = int(dilations[i])
        xs.append(x)
        y = x + t_bias[i][:, None, :]
        acc = jnp.zeros(x.shape[:2] + (w.wd.shape[-1],), jnp.float32)
        for j in range(k):
            acc = acc + jnp.einsum(
                "btc,cd->btd", _shift(y, (j - ctr) * d), w.wd[i, j])
        acc = acc + w.b[i]
        if cond_terms is not None:
            acc = acc + cond_terms[i] + w.bc[i]
        a_all.append(acc)
        c = x.shape[-1]
        g = jax.nn.sigmoid(acc[..., :c]) * jnp.tanh(acc[..., c:])
        out = jnp.einsum("btc,cd->btd", g, w.wo[i]) + w.bo[i]
        x = (x + out[..., :c]) * _SQRT_HALF
        skip_sum = skip_sum + out[..., c:]
    return (skip_sum / math.sqrt(n_layers),
            jnp.stack(xs), jnp.stack(a_all))


# ----------------------------------------------------------------- XLA bwd

def _bwd_xla(dilations, saves, cot, need_dcond: bool = True):
    x_shape_cond, t_bias, cond, w, xs, a_all = saves
    n_layers, k, c, two_c = w.wd.shape
    ctr = k // 2
    dskip = cot / math.sqrt(n_layers)

    dx = jnp.zeros_like(cot)
    dtb = []
    dwd = []
    dwo = []
    db = []
    dbo = []
    dwc = [] if cond is not None else None
    cond_p = _pad_cond(cond, w.wc.shape[1]) if cond is not None else None
    dcond_p = (jnp.zeros_like(cond_p, jnp.float32)
               if cond is not None and need_dcond else None)

    for i in reversed(range(n_layers)):
        d = int(dilations[i])
        a = a_all[i].astype(jnp.float32)  # saves may be bf16 (Pallas fwd)
        s1 = jax.nn.sigmoid(a[..., :c])
        th = jnp.tanh(a[..., c:])
        g = s1 * th

        dout = jnp.concatenate([dx * _SQRT_HALF, dskip], axis=-1)
        dwo.append(jnp.einsum("btc,btd->cd", g, dout))
        dbo.append(dout.sum((0, 1)))
        dg = jnp.einsum("btd,cd->btc", dout, w.wo[i])

        da = jnp.concatenate(
            [dg * th * s1 * (1.0 - s1), dg * s1 * (1.0 - th * th)], axis=-1)
        db.append(da.sum((0, 1)))
        if cond is not None:
            dwc.append(jnp.einsum("btm,btd->md", cond_p, da))
            if need_dcond:
                dcond_p = dcond_p + jnp.einsum("btd,md->btm", da, w.wc[i])

        y = xs[i].astype(jnp.float32) + t_bias[i][:, None, :]
        dy = jnp.zeros_like(dx)
        dwd_i = []
        for j in range(k):
            off = (j - ctr) * d
            dwd_i.append(jnp.einsum("btc,btd->cd", _shift(y, off), da))
            dy = dy + _shift(jnp.einsum("btd,cd->btc", da, w.wd[i, j]), -off)
        dwd.append(jnp.stack(dwd_i))
        dtb.append(dy.sum(1))
        dx = dx * _SQRT_HALF + dy

    def stack_rev(lst):
        return jnp.stack(lst[::-1])

    db_s = stack_rev(db)
    dcond = None
    dwc_s = dbc_s = None
    if cond is not None:
        dwc_s = stack_rev(dwc)
        dbc_s = db_s  # bc enters identically to b
        if need_dcond:
            dcond = dcond_p[:, :, : cond.shape[-1]]
    dw = GatedStackWeights(
        wd=stack_rev(dwd), wc=dwc_s, wo=stack_rev(dwo), b=db_s, bc=dbc_s,
        bo=stack_rev(dbo),
        wt=jnp.zeros_like(w.wt), bt=jnp.zeros_like(w.bt),
    )
    return dx, stack_rev(dtb), dcond, dw


# -------------------------------------------------------------- custom_vjp

# impl choices (static):
#   'xla'        — XLA fwd + XLA bwd (any backend; the semantic reference)
#   'pallas'     — Pallas fwd + Pallas bwd (TPU)
#   'pallas_fwd' — Pallas fwd-with-saves + XLA bwd from the saves. The
#                  measured default on TPU: the fused forward wins clearly
#                  (B=16: 5.7 ms vs 8.9 ms XLA) while the hand-written
#                  backward kernel loses to XLA's autodiff pipeline
#                  (12 ms vs ~7 ms — per-batch-tile weight-grad HBM
#                  round-trips dominate), so the hybrid takes the best of
#                  both.

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def gated_stack_trainable(
    dilations: Tuple[int, ...],
    impl: str,
    need_dcond: bool,
    x: jnp.ndarray,
    t_bias: jnp.ndarray,
    cond: Optional[jnp.ndarray],
    w: GatedStackWeights,
) -> jnp.ndarray:
    """`gated_stack` with an explicit VJP (usable under jax.grad).

    Same contract as `ops.gated_stack`; `dilations` must be a static
    tuple, `impl` one of 'xla' | 'pallas' | 'pallas_fwd'. With
    `need_dcond=False` the conditioner cotangent is returned as zeros
    without being computed — only sound when `cond` carries no gradient
    (the mel front-end has no parameters); wrap cond in
    `lax.stop_gradient` at the call site to make that explicit.
    """
    if impl in ("pallas", "pallas_fwd"):
        from .gated_stack_train import gated_stack_fwd_pallas

        skip, _, _ = gated_stack_fwd_pallas(x, t_bias, cond, w, dilations)
        return skip
    skip, _, _ = _fwd_saves_xla(x, t_bias, cond, w, dilations)
    return skip


def _vjp_fwd(dilations, impl, need_dcond, x, t_bias, cond, w):
    if impl in ("pallas", "pallas_fwd"):
        from .gated_stack_train import gated_stack_fwd_pallas

        skip, xs, a_all = gated_stack_fwd_pallas(x, t_bias, cond, w, dilations)
    else:
        skip, xs, a_all = _fwd_saves_xla(x, t_bias, cond, w, dilations)
    return skip, (x.shape, t_bias, cond, w, xs, a_all)


def _vjp_bwd(dilations, impl, need_dcond, saves, cot):
    if impl == "pallas":
        from .gated_stack_train import gated_stack_bwd_pallas

        out = gated_stack_bwd_pallas(dilations, saves, cot)
    else:
        out = _bwd_xla(dilations, saves, cot, need_dcond=need_dcond)
    if not need_dcond and saves[2] is not None and out[2] is None:
        out = (out[0], out[1], jnp.zeros_like(saves[2]), out[3])
    return out


gated_stack_trainable.defvjp(_vjp_fwd, _vjp_bwd)


# ------------------------------------------------- per-layer-params boundary

def _stack_layers(layers, cond_pad: int = 256) -> GatedStackWeights:
    """Per-layer weight dicts -> stacked GatedStackWeights (wt/bt unused
    here — t_bias is computed by the caller)."""
    def get(name):
        return jnp.stack([l[name] for l in layers])

    conditional = "wc" in layers[0]
    wc = bc = None
    if conditional:
        wc = get("wc")
        if wc.shape[1] < cond_pad:
            wc = jnp.pad(wc, ((0, 0), (0, cond_pad - wc.shape[1]), (0, 0)))
        bc = get("bc")
    dummy = jnp.zeros((len(layers), 1, 1), jnp.float32)
    return GatedStackWeights(wd=get("wd"), wc=wc, wo=get("wo"), b=get("b"),
                             bc=bc, bo=get("bo"), wt=dummy, bt=dummy[:, 0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def gated_stack_train_layers(
    dilations: Tuple[int, ...],
    impl: str,
    need_dcond: bool,
    x: jnp.ndarray,
    t_bias: jnp.ndarray,
    cond: Optional[jnp.ndarray],
    layers: Tuple[dict, ...],
) -> jnp.ndarray:
    """`gated_stack_trainable` with PER-LAYER weight dicts as the
    differentiable input (keys: wd (k,C,2C), wo (C,2C), b, bo (2C,), and
    wc (M,2C), bc (2C,) when conditional).

    This exists because leaving `jnp.stack` of the 15 layers' weights to
    XLA autodiff is catastrophically slow in its transpose (measured ~7 ms
    of a 25 ms train step); with the stacking inside the custom VJP the
    backward returns plain slices of the stacked gradients.
    """
    w = _stack_layers(layers)
    if impl in ("pallas", "pallas_fwd"):
        from .gated_stack_train import gated_stack_fwd_pallas

        skip, _, _ = gated_stack_fwd_pallas(x, t_bias, cond, w, dilations)
        return skip
    skip, _, _ = _fwd_saves_xla(x, t_bias, cond, w, dilations)
    return skip


def _layers_vjp_fwd(dilations, impl, need_dcond, x, t_bias, cond, layers):
    w = _stack_layers(layers)
    if impl in ("pallas", "pallas_fwd"):
        from .gated_stack_train import gated_stack_fwd_pallas

        skip, xs, a_all = gated_stack_fwd_pallas(x, t_bias, cond, w, dilations)
    else:
        skip, xs, a_all = _fwd_saves_xla(x, t_bias, cond, w, dilations)
    m0 = layers[0]["wc"].shape[0] if "wc" in layers[0] else None
    return skip, (x.shape, t_bias, cond, w, xs, a_all, m0)


def _layers_vjp_bwd(dilations, impl, need_dcond, saves, cot):
    *core, m0 = saves
    core = tuple(core)
    if impl == "pallas":
        from .gated_stack_train import gated_stack_bwd_pallas

        dx, dtb, dcond, dw = gated_stack_bwd_pallas(dilations, core, cot)
    else:
        dx, dtb, dcond, dw = _bwd_xla(dilations, core, cot,
                                      need_dcond=need_dcond)
    cond = saves[2]
    if not need_dcond and cond is not None and dcond is None:
        dcond = jnp.zeros_like(cond)
    n_layers = dw.wd.shape[0]
    dlayers = []
    for i in range(n_layers):
        dl = {"wd": dw.wd[i], "wo": dw.wo[i], "b": dw.b[i], "bo": dw.bo[i]}
        if dw.wc is not None:
            dl["wc"] = dw.wc[i, :m0]  # un-pad the conditioner width
            dl["bc"] = dw.bc[i]
        dlayers.append(dl)
    return dx, dtb, dcond, tuple(dlayers)


gated_stack_train_layers.defvjp(_layers_vjp_fwd, _layers_vjp_bwd)
