"""Sequence (time-axis) parallelism: the halo-exchange forward must equal
the dense forward, and the sharded sampler must run end-to-end on the
virtual device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffroll_tpu import models
from diffroll_tpu.parallel.context import (
    sample_sequence_parallel,
    sequence_parallel_forward,
)
from diffroll_tpu.parallel.mesh import make_mesh
from diffroll_tpu.tasks import DiffusionTask, TaskConfig

B, T, L, C, MAX_STEPS = 2, 64, 4, 16, 12
DIL = tuple(2 ** (i % 4) for i in range(L))  # dilations 1,2,4,8 — halo up to 8


@pytest.fixture(scope="module")
def setup():
    model = models.build(
        "ClassifierFreeDiffRoll", residual_channels=C, residual_layers=L,
        dilation_base=2, dilation_bound=4, frames=T, timesteps=MAX_STEPS,
    )
    params = model.init(jax.random.key(0))
    op = params["params"]["output_projection"]
    op["kernel"] = jax.random.normal(jax.random.key(9), op["kernel"].shape) * 0.1
    mesh = make_mesh(data=8, model=1, devices=jax.devices()[:8])
    return model, params, mesh


def test_sequence_parallel_matches_dense(setup):
    model, params, mesh = setup
    x = jax.random.normal(jax.random.key(1), (B, T, 88))
    t = jnp.array([3, 7])
    cond = jax.random.normal(jax.random.key(2), (B, T, model.config.n_mels))

    dense = model.apply(params, x, t, cond, None)
    sharded = sequence_parallel_forward(
        mesh, params, x, t, cond, n_layers=L, dilations=DIL,
        max_steps=MAX_STEPS)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               atol=2e-4, rtol=1e-3)


def test_sequence_parallel_unconditional(setup):
    model, params, mesh = setup
    x = jax.random.normal(jax.random.key(3), (B, T, 88))
    t = jnp.array([1, 5])
    dense = model.apply(params, x, t, None, None)
    sharded = sequence_parallel_forward(
        mesh, params, x, t, None, n_layers=L, dilations=DIL,
        max_steps=MAX_STEPS)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               atol=2e-4, rtol=1e-3)


def test_sample_sequence_parallel_end_to_end(setup):
    model, params, mesh = setup
    task = DiffusionTask(model, TaskConfig(
        timesteps=MAX_STEPS, w=0.5, sampling_type="cfdg_ddpm_x0",
        use_fused=False))
    wav = jax.random.normal(jax.random.key(4), (1, T * 512))
    x_T = jax.random.normal(jax.random.key(5), (1, T, 88))
    x0, _ = sample_sequence_parallel(task, params, x_T, jax.random.key(6),
                                     mesh, waveform=wav)
    assert x0.shape == (1, T, 88)
    assert np.isfinite(np.asarray(x0)).all()

    # must agree with the (unsharded, exact) sampler on the same keys
    ref, _ = task.sample(params, x_T, jax.random.key(6), waveform=wav)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(ref),
                               atol=5e-3, rtol=5e-3)


def test_sample_sequence_parallel_generation_matches_dense(setup):
    """Generation-from-noise must use the trained spec:=-1 substitution in
    the sequence-parallel path too (shared task plumbing)."""
    model, params, mesh = setup
    task = DiffusionTask(model, TaskConfig(
        timesteps=MAX_STEPS, sampling_type="generation_ddpm_x0",
        use_fused=False))
    x_T = jax.random.normal(jax.random.key(7), (1, T, 88))
    gen, _ = sample_sequence_parallel(task, params, x_T, jax.random.key(8),
                                      mesh)
    ref, _ = task.sample(params, x_T, jax.random.key(8))
    np.testing.assert_allclose(np.asarray(gen), np.asarray(ref),
                               atol=5e-3, rtol=5e-3)


def test_sequence_parallel_rejects_undersized_shards(setup):
    model, params, mesh = setup
    x = jax.random.normal(jax.random.key(9), (1, 32, 88))  # 4 frames/shard
    with pytest.raises(ValueError, match="halo"):
        sequence_parallel_forward(
            mesh, params, x, jnp.zeros((1,), jnp.int32), None,
            n_layers=L, dilations=DIL, max_steps=MAX_STEPS)
