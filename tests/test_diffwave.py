"""Vestigial-parity DiffWave audio net + param heatmap viz tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffroll_tpu.nn.diffwave import DiffWaveNet


def test_diffwave_forward_shapes():
    net = DiffWaveNet(residual_channels=8, residual_layers=3,
                      dilation_cycle_length=2, n_mels=12, max_steps=10)
    L = 1024  # 4 mel frames x 256 upsampling
    mel = jax.random.normal(jax.random.key(0), (2, 4, 12))
    audio = jax.random.normal(jax.random.key(1), (2, L))
    t = jnp.array([3, 7])
    params = net.init(jax.random.key(2), audio, t, mel)
    out = net.apply(params, audio, t, mel)
    assert out.shape == (2, L)
    # zero-init head -> exactly 0 at init
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_param_heatmaps():
    matplotlib = pytest.importorskip("matplotlib")
    from diffroll_tpu import models
    from diffroll_tpu.viz import param_heatmaps

    model = models.build("ClassifierFreeDiffRoll", residual_channels=8,
                         residual_layers=2, frames=16,
                         condition="trainable_z")
    params = model.init(jax.random.key(0))
    fig = param_heatmaps(params)
    assert fig is not None
    import matplotlib.pyplot as plt

    plt.close("all")
    # no trainable embeddings -> None
    m2 = models.build("ClassifierFreeDiffRoll", residual_channels=8,
                      residual_layers=2, frames=16)
    assert param_heatmaps(m2.init(jax.random.key(1))) is None
