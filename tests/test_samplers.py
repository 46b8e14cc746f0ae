"""Sampler-step tests: each jitted step is cross-checked against an
independent float64 numpy transcription of the reference update rules
(reference task/diffusion.py:804-1055)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffroll_tpu.diffusion import make_schedule, linear_beta_schedule, sample_loop
from diffroll_tpu.diffusion import samplers

T = 50
SHAPE = (2, 16, 8)


def _sched():
    return make_schedule(linear_beta_schedule(1e-4, 0.02, T))


def _np_tables():
    # Use the device-computed tables (validated against fp64 closed forms in
    # test_schedule.py) so these tests isolate the *update formula*: fp32
    # cancellation in 1 - sac[t-1]^2 makes independently-recomputed tables
    # diverge in the 4th digit at small t.
    s = _sched()
    return {
        "betas": np.asarray(s.betas),
        "alphas": np.asarray(s.alphas),
        "sra": np.asarray(s.sqrt_recip_alphas),
        "sac": np.asarray(s.sqrt_alphas_cumprod),
        "s1m": np.asarray(s.sqrt_one_minus_alphas_cumprod),
        "pv": np.asarray(s.posterior_variance),
    }


def _noise_for(key, shape):
    # the step fns draw their own noise from `key`; regenerate it the same way
    return np.asarray(jax.random.normal(key, shape, jnp.float32))


@pytest.mark.parametrize("t_index", [0, 1, 25, T - 1])
def test_ddpm_step_matches_reference_math(t_index):
    s, tb = _sched(), _np_tables()
    key = jax.random.PRNGKey(t_index)
    x = np.random.default_rng(0).normal(size=SHAPE).astype(np.float32)
    eps = np.random.default_rng(1).normal(size=SHAPE).astype(np.float32)

    got = samplers.ddpm_step(s, jnp.asarray(x), jnp.int32(t_index), jnp.asarray(eps), key)

    mean = tb["sra"][t_index] * (x - tb["betas"][t_index] * eps / tb["s1m"][t_index])
    if t_index == 0:
        want = mean
    else:
        want = mean + np.sqrt(tb["pv"][t_index]) * _noise_for(key, SHAPE)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("t_index", [0, 1, 25, T - 1])
def test_ddpm_x0_step_matches_reference_math(t_index):
    s, tb = _sched(), _np_tables()
    key = jax.random.PRNGKey(100 + t_index)
    x = np.random.default_rng(2).normal(size=SHAPE).astype(np.float32)
    x0 = np.random.default_rng(3).normal(size=SHAPE).astype(np.float32)

    got = samplers.ddpm_x0_step(s, jnp.asarray(x), jnp.int32(t_index), jnp.asarray(x0), key)

    if t_index == 0:
        want = x0 / tb["sac"][0]
    else:
        sigma = (tb["s1m"][t_index - 1] / tb["s1m"][t_index]) * np.sqrt(
            1 - tb["alphas"][t_index]
        )
        want = (
            tb["sac"][t_index - 1] * x0
            + np.sqrt(1 - tb["sac"][t_index - 1] ** 2 - sigma**2)
            * (x - tb["sac"][t_index] * x0)
            / tb["s1m"][t_index]
            + sigma * _noise_for(key, SHAPE)
        )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("t_index", [0, 1, 25, T - 1])
def test_ddim_x0_step_matches_reference_math(t_index):
    s, tb = _sched(), _np_tables()
    x = np.random.default_rng(4).normal(size=SHAPE).astype(np.float32)
    x0 = np.random.default_rng(5).normal(size=SHAPE).astype(np.float32)

    got = samplers.ddim_x0_step(s, jnp.asarray(x), jnp.int32(t_index), jnp.asarray(x0))

    if t_index == 0:
        want = x0 / tb["sac"][0]
    else:
        want = tb["sac"][t_index - 1] * x0 + np.sqrt(
            1 - tb["sac"][t_index - 1] ** 2
        ) * (x - tb["sac"][t_index] * x0) / tb["s1m"][t_index]
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("t_index", [0, 1, 25, T - 1])
def test_ddim_step_matches_reference_math(t_index):
    s, tb = _sched(), _np_tables()
    x = np.random.default_rng(6).normal(size=SHAPE).astype(np.float32)
    eps = np.random.default_rng(7).normal(size=SHAPE).astype(np.float32)

    got = samplers.ddim_step(s, jnp.asarray(x), jnp.int32(t_index), jnp.asarray(eps))

    x0_from_eps = (x - tb["s1m"][t_index] * eps) / tb["sac"][t_index]
    if t_index == 0:
        want = x0_from_eps
    else:
        want = tb["sac"][t_index - 1] * x0_from_eps + tb["s1m"][t_index - 1] * eps
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("t_index", [0, 1, T - 1])
def test_ddim2ddpm_step_matches_reference_math(t_index):
    s, tb = _sched(), _np_tables()
    key = jax.random.PRNGKey(200 + t_index)
    x = np.random.default_rng(8).normal(size=SHAPE).astype(np.float32)
    eps = np.random.default_rng(9).normal(size=SHAPE).astype(np.float32)

    got = samplers.ddim2ddpm_step(s, jnp.asarray(x), jnp.int32(t_index), jnp.asarray(eps), key)

    x0_from_eps = (x - tb["s1m"][t_index] * eps) / tb["sac"][t_index]
    if t_index == 0:
        want = x0_from_eps
    else:
        sigma = (tb["s1m"][t_index - 1] / tb["s1m"][t_index]) * np.sqrt(
            1 - tb["alphas"][t_index]
        )
        want = (
            tb["sac"][t_index - 1] * x0_from_eps
            + np.sqrt(1 - tb["sac"][t_index - 1] ** 2 - sigma**2) * eps
            + sigma * _noise_for(key, SHAPE)
        )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_cfg_mix():
    c = jnp.ones((2, 3)) * 2.0
    u = jnp.ones((2, 3))
    np.testing.assert_allclose(np.asarray(samplers.cfg_mix(c, u, 0.5)), 2.5)
    np.testing.assert_allclose(np.asarray(samplers.cfg_mix(c, u, 0.0)), 2.0)


def test_sampler_table_covers_reference_names():
    expected = {
        "ddpm", "ddpm_x0", "ddim", "ddim_x0", "ddim2ddpm",
        "cfdg_ddpm_x0", "cfdg_ddim_x0", "generation_ddpm_x0",
        "inpainting_ddpm_x0",
    }
    assert set(samplers.SAMPLER_TABLE) == expected


def test_sample_loop_perfect_oracle_recovers_x0():
    """If the model predicts the true x0 at every step, the scan converges
    to x0 (DDIM is exact for a perfect oracle)."""
    s = _sched()
    x_true = jnp.asarray(np.random.default_rng(10).normal(size=SHAPE).astype(np.float32))

    def step(x, t, t_prev, key):
        return samplers.ddim_x0_step(s, x, t, x_true, t_prev=t_prev)

    xT = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    x0, traj = sample_loop(step, xT, T, jax.random.PRNGKey(1))
    assert traj is None
    # final step divides by sqrt(alphas_cumprod[0]) ~= 1
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x_true), rtol=1e-3, atol=1e-3)


def test_sample_loop_trajectory_recording():
    s = _sched()

    def step(x, t, t_prev, key):
        return samplers.ddim_x0_step(s, x, t, jnp.zeros_like(x), t_prev=t_prev)

    xT = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    x0, traj = sample_loop(step, xT, T, jax.random.PRNGKey(3), record_every=10)
    assert traj.shape == (T // 10,) + SHAPE
    np.testing.assert_allclose(np.asarray(traj[-1]), 0.0, atol=1e-5)


def test_sample_loop_is_jittable_and_deterministic():
    s = _sched()

    def step(x, t, t_prev, key):
        return samplers.ddpm_x0_step(s, x, t, jnp.tanh(x), key, t_prev=t_prev)

    run = jax.jit(lambda xT, key: sample_loop(step, xT, T, key)[0])
    xT = jax.random.normal(jax.random.PRNGKey(4), SHAPE)
    a = run(xT, jax.random.PRNGKey(5))
    b = run(xT, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = run(xT, jax.random.PRNGKey(6))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_timestep_subsequence():
    from diffroll_tpu.diffusion.loop import timestep_subsequence

    ts = timestep_subsequence(200, None)
    assert ts[0] == 199 and ts[-1] == 0 and len(ts) == 200
    ts = timestep_subsequence(200, 25)
    assert ts[0] == 199 and ts[-1] == 0 and len(ts) == 25
    assert (np.diff(ts) < 0).all()
    ts = timestep_subsequence(10, 50)  # more steps than T -> dense
    assert len(ts) == 10


def test_strided_ddim_oracle_recovers_x0():
    """Strided DDIM with a perfect x0 oracle converges just like dense."""
    s = _sched()
    x_true = jnp.asarray(
        np.random.default_rng(11).normal(size=SHAPE).astype(np.float32))

    def step(x, t, t_prev, key):
        return samplers.ddim_x0_step(s, x, t, x_true, t_prev=t_prev)

    xT = jax.random.normal(jax.random.PRNGKey(7), SHAPE)
    x0, _ = sample_loop(step, xT, T, jax.random.PRNGKey(8), steps=8)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x_true),
                               rtol=1e-3, atol=1e-3)


def test_strided_sigma_matches_posterior_variance_adjacent():
    """The generalized ancestral sigma equals sqrt(posterior_variance[t])
    for adjacent steps (the reference's dense schedule)."""
    s = _sched()
    from diffroll_tpu.diffusion.samplers import _sigma

    for t in [1, 5, T // 2, T - 1]:
        sig = float(_sigma(s, jnp.int32(t), jnp.int32(t - 1)))
        ref = float(jnp.sqrt(s.posterior_variance[t]))
        np.testing.assert_allclose(sig, ref, rtol=1e-4)  # fp32 sqrt paths


def test_task_sampling_steps_end_to_end():
    """TaskConfig.sampling_steps runs the strided loop through the task."""
    from diffroll_tpu import models
    from diffroll_tpu.tasks import DiffusionTask, TaskConfig

    model = models.build("ClassifierFreeDiffRoll", residual_channels=16,
                         residual_layers=2, frames=32, timesteps=20)
    params = model.init(jax.random.key(0))
    task = DiffusionTask(model, TaskConfig(
        timesteps=20, sampling_steps=5, w=0.5, sampling_type="cfdg_ddim_x0"))
    wav = jax.random.normal(jax.random.key(1), (2, 32 * 512))
    x0, traj = task.sample(params, jax.random.normal(jax.random.key(2), (2, 32, 88)),
                           jax.random.key(3), waveform=wav, record_every=1)
    assert x0.shape == (2, 32, 88)
    assert traj.shape[0] == 5  # one state per visited step
    assert np.isfinite(np.asarray(x0)).all()


def test_generation_uses_trained_unconditional_mode():
    """Generation-from-noise on a conditional model must run the trained
    spec:=-1 unconditional substitution, not a skipped-conditioner forward
    (reference task/diffusion.py:988 via model/diffwave.py:656-660)."""
    from diffroll_tpu import models
    from diffroll_tpu.tasks import DiffusionTask, TaskConfig

    model = models.build("ClassifierFreeDiffRoll", residual_channels=16,
                         residual_layers=2, frames=32, timesteps=6)
    params = model.init(jax.random.key(0))
    # randomize the zero-init head: with it at zero every forward is
    # conditioner-independent and the test would be vacuous
    op = params["params"]["output_projection"]
    op["kernel"] = jax.random.normal(jax.random.PRNGKey(9),
                                     op["kernel"].shape) * 0.1
    task = DiffusionTask(model, TaskConfig(timesteps=6,
                                           sampling_type="generation_ddpm_x0"))
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 88))
    gen, _ = task.sample(params, x_T, jax.random.PRNGKey(2))

    # manual reference: same sampler with an explicit all -1 conditioner
    uncond = jnp.full((2, 32, model.config.n_mels), -1.0)
    cond_task = DiffusionTask(model, TaskConfig(timesteps=6,
                                                sampling_type="ddpm_x0"))
    step = cond_task.make_step_fn(params, uncond)
    ref, _ = sample_loop(step, x_T, 6, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(gen), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
