"""Tests for the denoiser stack: shape contracts, zero-init head, CFG
conditioning semantics, debug (roll-conditioned) variant, and golden conv
semantics vs torch (SAME dilated padding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffroll_tpu import models
from diffroll_tpu.nn.embedding import DiffusionEmbedding, _build_table
from diffroll_tpu.nn.resblock import ResidualBlock

B, T, F, M = 2, 64, 88, 229


def tiny(name="ClassifierFreeDiffRoll", **kw):
    base = dict(residual_channels=8, residual_layers=3, frames=T)
    base.update(kw)
    return models.build(name, **base)


# ---------------------------------------------------------------- embedding

def test_embedding_table_matches_reference_formula():
    table = _build_table(200, 128)
    steps = np.arange(200)[:, None]
    dims = np.arange(64)[None, :]
    angles = steps * 10.0 ** (dims * 4.0 / 63.0)
    expected = np.concatenate([np.sin(angles), np.cos(angles)], axis=1)
    np.testing.assert_allclose(table, expected, rtol=0, atol=2e-5)


def test_embedding_fractional_lerp():
    emb = DiffusionEmbedding(max_steps=200)
    params = emb.init(jax.random.key(0), jnp.zeros((1,), jnp.int32))
    lo = emb.apply(params, jnp.array([10], jnp.int32))
    hi = emb.apply(params, jnp.array([11], jnp.int32))
    # the lerp happens in table space before the MLP, so the midpoint output
    # need not be the output midpoint; but integer-valued floats must agree
    mid_int = emb.apply(params, jnp.array([10.0], jnp.float32))
    np.testing.assert_allclose(mid_int, lo, rtol=1e-5, atol=1e-5)
    frac = emb.apply(params, jnp.array([10.5], jnp.float32))
    assert not np.allclose(frac, lo) and not np.allclose(frac, hi)


# ---------------------------------------------------------------- resblock

def test_resblock_shapes_and_residual_scale():
    blk = ResidualBlock(residual_channels=16, dilation=2, kernel_size=3)
    x = jax.random.normal(jax.random.key(0), (B, T, 16))
    t_emb = jax.random.normal(jax.random.key(1), (B, 512))
    cond = jax.random.normal(jax.random.key(2), (B, T, M))
    # conditioner projection is a separate entry point (computed once per
    # clip by samplers); project first, then run the gated block
    params = blk.init(jax.random.key(3), cond, method="cond_proj")
    proj = blk.apply(params, cond, method="cond_proj")
    assert proj.shape == (B, T, 32)
    params = blk.init(jax.random.key(3), x, t_emb, proj)
    out, skip = blk.apply(params, x, t_emb, proj)
    assert out.shape == (B, T, 16) and skip.shape == (B, T, 16)


def test_dilated_conv_matches_torch_same_padding():
    """Reference padding ((k-1)(d-1)+k-1)//2 == flax 'SAME' for odd k.
    Validate numerics against torch.nn.functional.conv1d directly."""
    torch = pytest.importorskip("torch")
    k, d, cin, cout = 3, 4, 5, 7
    rng = np.random.RandomState(0)
    x = rng.randn(B, T, cin).astype(np.float32)
    w = rng.randn(k, cin, cout).astype(np.float32)  # flax HIO

    import flax.linen as nn

    conv = nn.Conv(cout, (k,), kernel_dilation=(d,), padding="SAME", use_bias=False)
    out = conv.apply({"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x))

    xt = torch.from_numpy(x.transpose(0, 2, 1))           # (B, Cin, T)
    wt = torch.from_numpy(w.transpose(2, 1, 0))           # (Cout, Cin, k)
    pad = ((k - 1) * (d - 1) + k - 1) // 2
    ref = torch.nn.functional.conv1d(xt, wt, padding=pad, dilation=d)
    np.testing.assert_allclose(
        np.asarray(out), ref.numpy().transpose(0, 2, 1), rtol=2e-4, atol=2e-4
    )


# ---------------------------------------------------------------- denoiser

def test_zero_init_output_head():
    model = tiny()
    params = model.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (B, T, F))
    cond = jax.random.normal(jax.random.key(2), (B, T, M))
    out = model.apply(params, x, jnp.array([0, 5]), cond)
    assert out.shape == (B, T, F)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


def _randomized_params(model, key):
    """Init then re-randomize the zero-init head so outputs are non-trivial."""
    params = model.init(key)
    flat = jax.tree_util.tree_map_with_path(
        lambda path, p: jax.random.normal(
            jax.random.fold_in(key, abs(hash(str(path))) % (2**31)), p.shape
        )
        * 0.05
        if "output_projection" in str(path)
        else p,
        params,
    )
    return flat


def test_cfg_uncond_mask_equals_minus_one_spec():
    """condition='fixed': masking a row must equal feeding spec == -1."""
    model = tiny()
    params = _randomized_params(model, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (B, T, F))
    cond = jax.random.uniform(jax.random.key(2), (B, T, M))
    t = jnp.array([3, 7])

    mask = jnp.array([True, False])
    out_masked = model.apply(params, x, t, cond, mask)
    cond_manual = cond.at[0].set(-1.0)
    out_manual = model.apply(params, x, t, cond_manual, None)
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_manual), rtol=1e-5, atol=1e-5
    )


def test_apply_cfg_batches_both_branches():
    model = tiny()
    params = _randomized_params(model, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (B, T, F))
    cond = jax.random.uniform(jax.random.key(2), (B, T, M))
    t = jnp.array([3, 7])

    c, u = model.apply_cfg(params, x, t, cond)
    c_ref = model.apply(params, x, t, cond, jnp.zeros((B,), bool))
    u_ref = model.apply(params, x, t, cond, jnp.ones((B,), bool))
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), rtol=1e-5, atol=1e-5)
    # the unconditional branch must differ from the conditional one
    assert not np.allclose(np.asarray(c), np.asarray(u))


def test_trainable_z_variant():
    model = tiny(condition="trainable_z")
    params = _randomized_params(model, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (B, T, F))
    cond = jax.random.uniform(jax.random.key(2), (B, T, M))
    t = jnp.array([3, 7])
    out = model.apply(params, x, t, cond, jnp.array([True, False]))
    assert out.shape == (B, T, F)
    # z params exist per layer
    leaves = jax.tree_util.tree_leaves_with_path(params)
    assert any("uncon_z" in str(p) for p, _ in leaves)


def test_debug_variant_uses_roll_conditioner():
    model = tiny("DiffRollDebug", residual_channels=8, residual_layers=2)
    params = model.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (B, T, F))
    roll = (jax.random.uniform(jax.random.key(2), (B, T, F)) > 0.9).astype(jnp.float32)
    cond = model.conditioner(roll=roll)
    assert cond.shape == (B, T, F)
    out = model.apply(params, x, jnp.array([1, 2]), cond)
    assert out.shape == (B, T, F)


def test_2d_variant_shapes():
    model = tiny("DiffRollv2", residual_channels=4, residual_layers=2)
    params = model.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (B, T, F))
    cond = jax.random.uniform(jax.random.key(2), (B, T, M))
    out = model.apply(params, x, jnp.array([1, 2]), cond)
    assert out.shape == (B, T, F)


def test_conditioner_spec_shape_and_range():
    model = tiny()
    wav = jax.random.normal(jax.random.key(0), (B, T * 512))
    cond = model.conditioner(waveform=wav)
    assert cond.shape == (B, T, M)
    assert float(jnp.min(cond)) >= -1e-6 and float(jnp.max(cond)) <= 1 + 1e-6


def test_inpainting_mask_regions():
    model = tiny()
    wav = jax.random.normal(jax.random.key(0), (B, T * 512))
    cond = model.conditioner(waveform=wav, inpainting_t=(10, 20))
    assert np.all(np.asarray(cond[:, 10:20, :]) == -1.0)
    assert not np.all(np.asarray(cond[:, :10, :]) == -1.0)
    cond_f = model.conditioner(waveform=wav, inpainting_f=(0, 50))
    assert np.all(np.asarray(cond_f[:, :, 0:50]) == -1.0)
