"""Tests for min-max normalization (reference model/utils.py:2-38)."""

import numpy as np
import jax.numpy as jnp

from diffroll_tpu.dsp import Normalization, min_max_normalize


def test_imagewise_range():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 229, 641)).astype(np.float32)
    out = np.asarray(min_max_normalize(jnp.asarray(x), 0.0, 1.0, "imagewise"))
    for i in range(4):
        assert abs(out[i].min() - 0.0) < 1e-6
        assert abs(out[i].max() - 1.0) < 1e-6


def test_imagewise_matches_reference_formula():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 10, 7)).astype(np.float32)
    lo, hi = -1.0, 1.0
    out = np.asarray(min_max_normalize(jnp.asarray(x), lo, hi, "imagewise"))
    x_min = x.reshape(3, -1).min(1)[:, None, None]
    x_max = x.reshape(3, -1).max(1)[:, None, None]
    want = (x - x_min) / (x_max - x_min) * (hi - lo) + lo
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


def test_empty_input_maps_to_lo():
    # an all-zero piano roll must map to the range minimum
    # (reference model/utils.py:32 "if piano roll is empty, turn them to min")
    x = jnp.zeros((2, 5, 5))
    out = np.asarray(min_max_normalize(x, -1.0, 1.0, "imagewise"))
    np.testing.assert_allclose(out, -1.0)
    out = np.asarray(min_max_normalize(x, 0.0, 1.0, "imagewise"))
    np.testing.assert_allclose(out, 0.0)


def test_framewise_mode():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 6, 4)).astype(np.float32)
    out = np.asarray(min_max_normalize(jnp.asarray(x), 0.0, 1.0, "framewise", axis=-1))
    np.testing.assert_allclose(out.min(axis=-1), 0.0, atol=1e-6)
    np.testing.assert_allclose(out.max(axis=-1), 1.0, atol=1e-6)


def test_binary_roll_preserved():
    """A 0/1 roll normalized to [-1,1] becomes exactly -1/+1."""
    roll = jnp.asarray(np.random.default_rng(3).integers(0, 2, (2, 640, 88)).astype(np.float32))
    out = np.asarray(min_max_normalize(roll, -1.0, 1.0, "imagewise"))
    assert set(np.unique(out)) <= {-1.0, 1.0}


def test_callable_wrapper():
    norm = Normalization(0, 1, "imagewise")
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 3, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(norm(x)), np.asarray(min_max_normalize(x, 0, 1, "imagewise"))
    )
