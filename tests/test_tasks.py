"""Task-layer tests: training losses (all modes + dual-dataset), the full
sampling path for every registered sampler, and the baseline task."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffroll_tpu import models
from diffroll_tpu.diffusion.samplers import SAMPLER_TABLE
from diffroll_tpu.tasks import BaselineConfig, BaselineTask, DiffusionTask, TaskConfig

B, T, F = 2, 32, 88
TS = 8  # tiny diffusion for tests


@pytest.fixture(scope="module")
def setup():
    model = models.build(
        "ClassifierFreeDiffRoll",
        residual_channels=8, residual_layers=2, frames=T, timesteps=TS,
    )
    params = model.init(jax.random.key(0))
    batch = {
        "frame": (jax.random.uniform(jax.random.key(1), (B, T, F)) > 0.9).astype(
            jnp.float32
        ),
        "audio": jax.random.normal(jax.random.key(2), (B, T * 512)),
    }
    return model, params, batch


@pytest.mark.parametrize("mode", ["x_0", "epsilon", "ex_0"])
def test_loss_modes(setup, mode):
    model, params, batch = setup
    task = DiffusionTask(model, TaskConfig(timesteps=TS, training_mode=mode))
    total, (losses, tensors) = task.loss_fn(params, batch, jax.random.key(3))
    assert np.isfinite(float(total))
    assert "diffusion_loss" in losses
    assert tensors["pred_roll"].shape == (B, T, F)


def test_loss_is_jittable_and_grads_flow(setup):
    model, params, batch = setup
    task = DiffusionTask(model, TaskConfig(timesteps=TS))

    @jax.jit
    def grad_step(p, b, k):
        (total, _), grads = jax.value_and_grad(task.loss_fn, has_aux=True)(p, b, k)
        return total, grads

    total, grads = grad_step(params, batch, jax.random.key(3))
    assert np.isfinite(float(total))
    gnorm = sum(
        float(jnp.sum(g**2)) for g in jax.tree_util.tree_leaves(grads)
    )
    assert gnorm > 0.0


def test_dual_dataset_branch(setup):
    model, params, batch = setup
    batch2 = {
        "frame": (jax.random.uniform(jax.random.key(5), (B, T, F)) > 0.85).astype(
            jnp.float32
        ),
        "audio": jax.random.normal(jax.random.key(6), (B, T * 512)),
    }
    cfg = TaskConfig(
        timesteps=TS,
        loss_keys=("diffusion_loss", "unconditional_diffusion_loss"),
    )
    task = DiffusionTask(model, cfg)
    total, (losses, _) = task.loss_fn(params, (batch, batch2), jax.random.key(3))
    assert "unconditional_diffusion_loss" in losses
    expected = float(losses["diffusion_loss"]) + float(
        losses["unconditional_diffusion_loss"]
    )
    assert float(total) == pytest.approx(expected, rel=1e-6)


@pytest.mark.parametrize("sampler", sorted(SAMPLER_TABLE))
def test_every_sampler_runs_end_to_end(setup, sampler):
    model, params, batch = setup
    w = 0.5 if "cfdg" in sampler or "inpainting" in sampler else 0.0
    task = DiffusionTask(
        model, TaskConfig(timesteps=TS, sampling_type=sampler, w=w)
    )
    x_T = jax.random.normal(jax.random.key(7), (B, T, F))
    x0, traj = task.sample(
        params, x_T, jax.random.key(8), waveform=batch["audio"], record_every=4
    )
    assert x0.shape == (B, T, F)
    assert np.isfinite(np.asarray(x0)).all()
    assert traj.shape[0] == TS // 4


def test_sample_jit_deterministic(setup):
    model, params, batch = setup
    task = DiffusionTask(model, TaskConfig(timesteps=TS))
    run = task.sample_jit(donate=False)
    x_T = jax.random.normal(jax.random.key(7), (B, T, F))
    a = run(params, x_T, jax.random.key(9), batch["audio"])
    b = run(params, x_T, jax.random.key(9), batch["audio"])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_inpainting_task_masks_conditioner(setup):
    model, params, batch = setup
    task = DiffusionTask(
        model,
        TaskConfig(
            timesteps=TS, sampling_type="inpainting_ddpm_x0", w=0.5,
            inpainting_t=(4, 10),
        ),
    )
    x_T = jax.random.normal(jax.random.key(7), (B, T, F))
    x0, _ = task.sample(params, x_T, jax.random.key(8), waveform=batch["audio"])
    assert np.isfinite(np.asarray(x0)).all()


def test_unknown_sampler_raises(setup):
    model, _, _ = setup
    with pytest.raises(KeyError):
        DiffusionTask(model, TaskConfig(sampling_type="nope"))


def test_debug_mode_uses_roll(setup):
    # debug pairs with the DiffRollDebug preset (n_mels=88, roll conditioner)
    _, _, batch = setup
    model = models.build(
        "DiffRollDebug", residual_channels=8, residual_layers=2,
        frames=T, timesteps=TS,
    )
    params = model.init(jax.random.key(0))
    task = DiffusionTask(model, TaskConfig(timesteps=TS, debug=True))
    total, (_, tensors) = task.loss_fn(params, batch, jax.random.key(3))
    assert tensors["spec"].shape == (B, T, F)
    assert np.isfinite(float(total))


# ------------------------------------------------------------------ baseline

def test_baseline_task():
    model = models.build(
        "DiffRollBaseline", residual_channels=8, residual_layers=2, frames=T,
    )
    params = model.init(jax.random.key(0))
    batch = {
        "frame": (jax.random.uniform(jax.random.key(1), (B, T, F)) > 0.9).astype(
            jnp.float32
        ),
        "audio": jax.random.normal(jax.random.key(2), (B, T * 512)),
    }
    task = BaselineTask(model, BaselineConfig(timesteps=TS))
    total, (losses, _) = task.loss_fn(params, batch, jax.random.key(3))
    assert "amt_loss" in losses and np.isfinite(float(total))

    pred = task.predict(params, batch, jax.random.key(4))
    assert pred.shape == (B, T, F)

    x0, _ = task.sample(
        params,
        jax.random.normal(jax.random.key(5), (B, T, F)),
        jax.random.key(6),
        batch["audio"],
    )
    assert np.isfinite(np.asarray(x0)).all()


@pytest.mark.parametrize("time_mode", ["constant", "constant_maxT", "random"])
def test_baseline_time_modes(time_mode):
    model = models.build(
        "DiffRollBaseline", residual_channels=8, residual_layers=2, frames=T,
    )
    params = model.init(jax.random.key(0))
    batch = {
        "frame": jnp.zeros((B, T, F)),
        "audio": jax.random.normal(jax.random.key(2), (B, T * 512)),
    }
    task = BaselineTask(model, BaselineConfig(timesteps=TS, time_mode=time_mode))
    total, _ = task.loss_fn(params, batch, jax.random.key(3))
    assert np.isfinite(float(total))
