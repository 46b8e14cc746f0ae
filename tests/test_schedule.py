"""Unit tests for schedule math and the forward process against closed forms
(reference semantics: task/diffusion.py:28-64, 237-256)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffroll_tpu.diffusion import (
    Schedule,
    linear_beta_schedule,
    cosine_beta_schedule,
    quadratic_beta_schedule,
    sigmoid_beta_schedule,
    make_schedule,
    q_sample,
    extract_x0,
)

T = 200
BETA_START, BETA_END = 1e-4, 0.02


def _sched() -> Schedule:
    return make_schedule(linear_beta_schedule(BETA_START, BETA_END, T))


def test_linear_betas_endpoints():
    betas = np.asarray(linear_beta_schedule(BETA_START, BETA_END, T))
    assert betas.shape == (T,)
    np.testing.assert_allclose(betas[0], BETA_START, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], BETA_END, rtol=1e-6)
    assert np.all(np.diff(betas) > 0)


def test_schedule_tables_closed_form():
    s = _sched()
    betas = np.asarray(s.betas, dtype=np.float64)
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.concatenate([[1.0], acp[:-1]])

    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), acp, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod_prev), acp_prev, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s.sqrt_recip_alphas), np.sqrt(1 / alphas), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s.sqrt_alphas_cumprod), np.sqrt(acp), rtol=1e-5)
    # 1 - acp suffers fp32 cancellation at small t (acp ~ 1 - 1e-4), so the
    # fp64 oracle can differ by ~eps/1e-4 ~ 6e-4 relative there.
    np.testing.assert_allclose(
        np.asarray(s.sqrt_one_minus_alphas_cumprod), np.sqrt(1 - acp), rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(s.posterior_variance),
        betas * (1 - acp_prev) / (1 - acp),
        rtol=2e-3,
    )
    assert s.timesteps == T


def test_alternate_beta_schedules_shapes_and_ranges():
    for betas in (
        cosine_beta_schedule(T),
        quadratic_beta_schedule(T),
        sigmoid_beta_schedule(T),
    ):
        b = np.asarray(betas)
        assert b.shape == (T,)
        assert np.all(b > 0) and np.all(b < 1)


def test_q_sample_matches_closed_form():
    s = _sched()
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, (4, 1, 640, 88))
    noise = jax.random.normal(k2, x0.shape)
    t = jax.random.randint(k3, (4,), 0, T)

    xt = q_sample(x0, t, s, noise)
    a = np.asarray(s.sqrt_alphas_cumprod)[np.asarray(t)][:, None, None, None]
    b = np.asarray(s.sqrt_one_minus_alphas_cumprod)[np.asarray(t)][:, None, None, None]
    np.testing.assert_allclose(
        np.asarray(xt), a * np.asarray(x0) + b * np.asarray(noise), rtol=1e-5, atol=1e-6
    )


def test_q_sample_t0_is_nearly_clean():
    s = _sched()
    x0 = jnp.ones((2, 640, 88))
    noise = jnp.zeros_like(x0)
    xt = q_sample(x0, jnp.zeros((2,), jnp.int32), s, noise)
    np.testing.assert_allclose(np.asarray(xt), np.sqrt(1 - BETA_START), rtol=1e-5)


def test_extract_x0_inverts_q_sample():
    s = _sched()
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, (3, 640, 88))
    noise = jax.random.normal(k2, x0.shape)
    t = jax.random.randint(k3, (3,), 0, T)
    xt = q_sample(x0, t, s, noise)
    rec = extract_x0(xt, noise, t, s)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_q_sample_arbitrary_rank():
    s = _sched()
    x0 = jnp.ones((2, 5))
    noise = jnp.zeros_like(x0)
    out = q_sample(x0, jnp.array([0, 100]), s, noise)
    assert out.shape == (2, 5)
