"""Sampler fast path: the full DiffRollNet forward over raw params,
with the residual stack running in the fused Pallas kernel.

`fused_forward(params, ...)` is numerically equivalent (up to bf16 matmul
precision) to `DiffRollNet.apply(params, ...)` for the 1-D 'fixed'-condition
family — the flagship ClassifierFreeDiffRoll (reference
model/diffwave.py:579-699), DiffRoll, DiffRollBaseline and the
unconditional case. It exists so the reverse-diffusion scan spends its time
in ONE kernel per step instead of ~45 XLA ops: head and embedding are tiny
einsums here, the 15-layer gated stack is a single `pallas_call`.

Used by `DiffusionTask.make_step_fn` when `TaskConfig.use_fused` resolves,
and by the TRAINING loss when `TaskConfig.fused_train` resolves: pass
`trainable=` an impl name ('pallas_fwd' on TPU) to route the stack through
`gated_stack_trainable` (ops/gated_stack_grad.py), which carries a custom
VJP — measured 1.29x over XLA autodiff for the stack fwd+bwd at B=16.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..nn.embedding import _build_table
from .gated_stack import GatedStackWeights, gated_stack, stack_weights


def supports_fused(model_config) -> bool:
    """The fused path covers the 1-D stack with 'fixed' (spec := -1)
    classifier-free conditioning or no conditioning at all."""
    return model_config.variant == "1d" and (
        model_config.condition == "fixed" or model_config.unconditional
    )


def _dense(x, scope, kernel_slice0=True):
    k = scope["kernel"]
    if kernel_slice0 and k.ndim == 3:  # 1x1 conv kernels are (1, I, O)
        k = k[0]
    return x @ k + scope["bias"]


def _embed(t, scope, max_steps: int, dim: int = 128):
    table = jnp.asarray(_build_table(max_steps, dim))
    if jnp.issubdtype(t.dtype, jnp.integer):
        e = table[t]
    else:
        low = jnp.floor(t).astype(jnp.int32)
        high = jnp.ceil(t).astype(jnp.int32)
        frac = (t - low.astype(t.dtype))[..., None]
        e = table[low] + (table[high] - table[low]) * frac
    e = jax.nn.silu(_dense(e, scope["projection1"], kernel_slice0=False))
    return jax.nn.silu(_dense(e, scope["projection2"], kernel_slice0=False))


def fused_forward(
    params,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    cond: Optional[jnp.ndarray],
    *,
    n_layers: int,
    dilations,
    max_steps: int,
    weights: Optional[GatedStackWeights] = None,
    use_pallas: Optional[bool] = None,
    trainable: Optional[str] = None,
    need_dcond: bool = True,
) -> jnp.ndarray:
    """x_t (B, T, 88), t (B,), cond (B, T, M) already substituted (-1 rows
    for unconditional CFG branches) or None -> (B, T, 88).

    Pass `weights` (from `stack_weights(params, n_layers)`) to reuse the
    stacked arrays across sampler steps.
    """
    p = params["params"] if "params" in params else params

    x = jax.nn.relu(_dense(x_t, p["input_projection"]))
    t_emb = _embed(t, p["diffusion_embedding"], max_steps)

    if trainable is not None:
        # training path: per-layer weight dicts into the custom-VJP op —
        # stacking happens INSIDE its boundary (XLA autodiff of jnp.stack
        # has a pathologically slow transpose; see gated_stack_grad.py)
        from .gated_stack_grad import gated_stack_train_layers

        layer_scopes = [p[f"residual_layers_{i}"] for i in range(n_layers)]
        conditional = ("conditioner_projection" in layer_scopes[0]
                       and cond is not None)
        layers = []
        tb_rows = []
        for scope in layer_scopes:
            d = {"wd": scope["dilated_conv"]["kernel"],
                 "b": scope["dilated_conv"]["bias"],
                 "wo": scope["output_projection"]["kernel"][0],
                 "bo": scope["output_projection"]["bias"]}
            if conditional:
                d["wc"] = scope["conditioner_projection"]["kernel"][0]
                d["bc"] = scope["conditioner_projection"]["bias"]
            layers.append(d)
            tb_rows.append(_dense(t_emb, scope["diffusion_projection"],
                                  kernel_slice0=False))
        t_bias = jnp.stack(tb_rows)  # (L, B, C) — small, autodiff is fine
        skip = gated_stack_train_layers(
            tuple(int(d) for d in dilations), trainable, need_dcond,
            x, t_bias, cond if conditional else None, tuple(layers))
    else:
        if weights is None:
            weights = stack_weights(params, n_layers)
        # all layers' FiLM biases in one einsum: (L, B, C)
        t_bias = (jnp.einsum("be,lec->lbc", t_emb, weights.wt)
                  + weights.bt[:, None, :])
        cond_in = cond if weights.wc is not None else None
        skip = gated_stack(x, t_bias, cond_in, weights, dilations,
                           use_pallas=use_pallas)

    y = jax.nn.relu(_dense(skip, p["skip_projection"]))
    return _dense(y, p["output_projection"])
