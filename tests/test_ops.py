"""Fused gated-stack op tests: XLA reference vs the flax net, and the
Pallas kernel (interpret mode on CPU) vs the XLA reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffroll_tpu.nn.denoiser import DiffRollNet
from diffroll_tpu.ops import (
    fused_forward,
    gated_stack_xla,
    stack_weights,
    supports_fused,
)
from diffroll_tpu.ops.gated_stack import gated_stack_pallas

B, T, C, M, L, K, MAX_STEPS = 2, 64, 16, 12, 4, 3, 10
DIL = tuple(2 ** (i % 2) for i in range(L))


@pytest.fixture(scope="module")
def net_and_params():
    net = DiffRollNet(
        residual_channels=C, residual_layers=L, kernel_size=K,
        dilation_base=2, dilation_bound=2, max_steps=MAX_STEPS, n_mels=M,
    )
    key = jax.random.key(0)
    params = net.init(
        key, jnp.zeros((1, T, 88)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, T, M)), None,
    )
    # randomize the zero-init head so outputs are non-trivial
    params = jax.tree_util.tree_map(
        lambda x: x, params)
    op = params["params"]["output_projection"]
    op["kernel"] = jax.random.normal(jax.random.key(9), op["kernel"].shape) * 0.1
    return net, params


def _inputs(seed=1):
    ks = jax.random.split(jax.random.key(seed), 3)
    x = jax.random.normal(ks[0], (B, T, 88))
    t = jnp.array([3, 7] if B == 2 else [3] * B)
    cond = jax.random.normal(ks[1], (B, T, M))
    return x, t, cond


def test_fused_forward_matches_flax(net_and_params):
    net, params = net_and_params
    x, t, cond = _inputs()
    ref = net.apply(params, x, t, cond, None)
    out = fused_forward(params, x, t, cond, n_layers=L, dilations=DIL,
                        max_steps=MAX_STEPS, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)


def test_fused_forward_unconditional_matches_flax():
    net = DiffRollNet(
        residual_channels=C, residual_layers=L, kernel_size=K,
        dilation_base=2, dilation_bound=2, max_steps=MAX_STEPS,
        unconditional=True,
    )
    params = net.init(jax.random.key(0), jnp.zeros((1, T, 88)),
                      jnp.zeros((1,), jnp.int32), None, None)
    op = params["params"]["output_projection"]
    op["kernel"] = jax.random.normal(jax.random.key(9), op["kernel"].shape) * 0.1
    x, t, _ = _inputs()
    ref = net.apply(params, x, t, None, None)
    out = fused_forward(params, x, t, None, n_layers=L, dilations=DIL,
                        max_steps=MAX_STEPS, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)


def test_pallas_kernel_matches_xla_interpret(net_and_params):
    """The Pallas kernel in interpreter mode (runs on CPU) vs XLA reference.
    bf16 matmuls => loose tolerance."""
    net, params = net_and_params
    x, t, cond = _inputs()
    w = stack_weights(params, L)
    t_emb = jax.random.normal(jax.random.key(5), (B, 512))
    t_bias = jnp.einsum("be,lec->lbc", t_emb, w.wt) + w.bt[:, None, :]

    ref = gated_stack_xla(x[..., :C] * 0 + jax.random.normal(
        jax.random.key(6), (B, T, C)), t_bias, cond, w, DIL)
    xin = jax.random.normal(jax.random.key(6), (B, T, C))
    ref = gated_stack_xla(xin, t_bias, cond, w, DIL)
    out = gated_stack_pallas(xin, t_bias, cond, w, DIL, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.05, rtol=0.05)
    # and the unconditional variant
    ref_u = gated_stack_xla(xin, t_bias, None, w._replace(wc=None), DIL)
    out_u = gated_stack_pallas(xin, t_bias, None, w._replace(wc=None), DIL,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(ref_u),
                               atol=0.05, rtol=0.05)


def test_supports_fused():
    from diffroll_tpu import models

    assert supports_fused(models.PRESETS["ClassifierFreeDiffRoll"])
    assert supports_fused(models.PRESETS["DiffRoll"])
    assert not supports_fused(models.PRESETS["DiffRollv2"])
    assert not supports_fused(models.PRESETS["Unet"])


def test_fused_cond_none_matches_flax_on_conditional_net(net_and_params):
    """A conditional net evaluated WITHOUT a conditioner must agree between
    the fused and flax paths (the conditioner bias must not leak in)."""
    net, params = net_and_params
    # give the conditioner biases non-zero values to make leakage visible
    import jax

    for i in range(L):
        scope = params["params"][f"residual_layers_{i}"]["conditioner_projection"]
        scope["bias"] = jax.random.normal(jax.random.key(50 + i),
                                          scope["bias"].shape)
    x, t, _ = _inputs()
    ref = net.apply(params, x, t, None, None)
    out = fused_forward(params, x, t, None, n_layers=L, dilations=DIL,
                        max_steps=MAX_STEPS, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)


def test_pallas_batch_tiling_interpret(net_and_params):
    """Batches larger than the VMEM tile run via the batch grid dimension
    and still match the XLA reference (odd batch -> tile 3, even -> 4)."""
    net, params = net_and_params
    w = stack_weights(params, L)
    t_emb = jax.random.normal(jax.random.key(5), (12, 512))
    t_bias = jnp.einsum("be,lec->lbc", t_emb, w.wt) + w.bt[:, None, :]
    xin = jax.random.normal(jax.random.key(6), (12, T, C))
    cond = jax.random.normal(jax.random.key(7), (12, T, M))
    ref = gated_stack_xla(xin, t_bias, cond, w, DIL)
    out = gated_stack_pallas(xin, t_bias, cond, w, DIL, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.05, rtol=0.05)
