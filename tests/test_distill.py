"""Progressive distillation: math inversions, grid nesting, and an
end-to-end stage on a tiny model (diffusion/distill.py, train/distill.py).
No reference counterpart — the reference always walks all 200 steps
(reference task/diffusion.py:779)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffroll_tpu import models
from diffroll_tpu.diffusion.distill import (
    ddim_x0_target,
    ddim_x0_vec,
    distill_grids,
    truncated_snr_weight,
)
from diffroll_tpu.diffusion.loop import timestep_subsequence
from diffroll_tpu.diffusion.samplers import ddim_x0_step
from diffroll_tpu.diffusion.schedule import linear_schedule
from diffroll_tpu.tasks import DiffusionTask, TaskConfig
from diffroll_tpu.train.distill import (
    DistillConfig,
    distill_stage,
    make_distill_loss,
    progressive_distill,
)

T = 100
SCHED = linear_schedule(1e-4, 0.02, T)


def test_grids_nest_exactly():
    """Student grid == sampling grid for sampling_steps=n; midpoints are
    the skipped teacher points; chained stages stay nested."""
    for n in (33, 17, 9, 5, 3, 2):
        student, mid = distill_grids(T, n)
        np.testing.assert_array_equal(student, timestep_subsequence(T, n))
        assert len(mid) == n - 1
        teacher = timestep_subsequence(T, 2 * n - 1)
        np.testing.assert_array_equal(np.sort(np.concatenate([student, mid]))[::-1],
                                      teacher)
        # strictly between the student endpoints
        assert np.all(mid < student[:-1]) and np.all(mid > student[1:])


def test_grid_chain_halving():
    cfg = DistillConfig(start_steps=33, stages=5)
    assert cfg.stage_steps() == [33, 17, 9, 5, 3]
    # each stage's grid is every other point of the previous stage's
    # teacher grid == a subset of the previous student grid
    prev, _ = distill_grids(T, 33)
    for n in (17, 9, 5, 3):
        cur, mid = distill_grids(T, n)
        assert set(cur.tolist()) <= set(prev.tolist())
        assert set(mid.tolist()) <= set(prev.tolist())
        prev = cur


def test_ddim_vec_matches_scalar_step():
    """ddim_x0_vec with a constant t vector == samplers.ddim_x0_step."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 8, 4).astype(np.float32))
    x0 = jnp.asarray(rng.randn(3, 8, 4).astype(np.float32))
    for t, tp in ((80, 40), (40, 0), (0, -1)):
        a = ddim_x0_step(SCHED, x, jnp.int32(t), x0, None,
                         t_prev=jnp.int32(tp))
        b = ddim_x0_vec(SCHED, x, jnp.full((3,), t, jnp.int32),
                        jnp.full((3,), tp, jnp.int32), x0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_target_inversion_exact():
    """A student predicting ddim_x0_target lands its ONE step exactly on
    the given x_tp — including the final tp == -1 transition."""
    rng = np.random.RandomState(1)
    x_t = jnp.asarray(rng.randn(4, 6, 5).astype(np.float32))
    x_tp = jnp.asarray(rng.randn(4, 6, 5).astype(np.float32))
    t = jnp.asarray([90, 50, 10, 0], jnp.int32)
    tp = jnp.asarray([45, 25, 0, -1], jnp.int32)
    x0_star = ddim_x0_target(SCHED, x_t, t, tp, x_tp)
    reached = ddim_x0_vec(SCHED, x_t, t, tp, x0_star)
    np.testing.assert_allclose(np.asarray(reached), np.asarray(x_tp),
                               atol=1e-4)


def test_one_student_step_covers_two_teacher_steps():
    """With a real (random-weight) teacher net, the distillation target's
    single step reproduces the teacher's two-step result exactly."""
    model = models.build("ClassifierFreeDiffRoll", residual_channels=8,
                         residual_layers=2, frames=16, timesteps=T)
    params = model.init(jax.random.key(0))
    rng = np.random.RandomState(2)
    x_t = jnp.asarray(rng.randn(2, 16, 88).astype(np.float32))
    cond = jnp.asarray(rng.randn(2, 16, model.config.n_mels)
                       .astype(np.float32))
    t = jnp.asarray([88, 60], jnp.int32)
    tm = jnp.asarray([66, 30], jnp.int32)
    tp = jnp.asarray([44, 0], jnp.int32)

    x0_a = model.apply(params, x_t, t, cond, None)
    x_tm = ddim_x0_vec(SCHED, x_t, t, tm, x0_a)
    x0_b = model.apply(params, x_tm, tm, cond, None)
    x_tp = ddim_x0_vec(SCHED, x_tm, tm, tp, x0_b)

    target = ddim_x0_target(SCHED, x_t, t, tp, x_tp)
    np.testing.assert_allclose(
        np.asarray(ddim_x0_vec(SCHED, x_t, t, tp, target)),
        np.asarray(x_tp), atol=1e-4)


def test_snr_weight_floor():
    w = truncated_snr_weight(SCHED, jnp.asarray([0, T - 1]), 3, clip=1.0)
    assert w.shape == (2, 1, 1)
    assert float(w[0, 0, 0]) > 1.0      # high SNR at t=0
    assert float(w[1, 0, 0]) == 1.0     # floored at t=T-1


@pytest.fixture(scope="module")
def tiny_setup():
    model = models.build("ClassifierFreeDiffRoll", residual_channels=8,
                         residual_layers=2, frames=16, timesteps=T)
    params = model.init(jax.random.key(0))
    # randomize the zero-init output head: a teacher predicting x0 == 0
    # composes EXACTLY across DDIM steps, which makes every distillation
    # target trivially zero (degenerate for these tests)
    head = params["params"]["output_projection"]
    head["kernel"] = 0.1 * jax.random.normal(jax.random.key(9),
                                             head["kernel"].shape)
    rng = np.random.RandomState(3)
    batch = {
        "frame": jnp.asarray((rng.rand(4, 16, 88) > 0.9).astype(np.float32)),
        "audio": jnp.asarray(rng.randn(4, 16 * 512).astype(np.float32)),
    }
    return model, params, batch


def test_perfect_student_has_near_zero_loss(tiny_setup):
    """Loss at student == teacher (unguided): the only residual is the
    teacher's own two-step vs one-step curvature, which must be small but
    nonzero; and the loss is finite + differentiable."""
    model, params, batch = tiny_setup
    grid, mid = distill_grids(T, 9)
    loss_fn = make_distill_loss(model, SCHED, params, grid, mid,
                                guided=False, w=0.0)
    loss, (losses, _) = loss_fn(params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: loss_fn(p, batch, jax.random.key(1))[0])(params)
    assert all(np.all(np.isfinite(x)) for x in jax.tree_util.tree_leaves(g))


def test_distill_stage_reduces_loss(tiny_setup):
    """A short guided stage: loss drops and the student samples through the
    ordinary few-step path."""
    model, params, batch = tiny_setup

    def batches():
        while True:
            yield batch

    losses = []
    student, last = distill_stage(
        model, SCHED, params, batches(), T, student_steps=9, n_steps=150,
        lr=1e-3, guided=True, w=0.5,
        log=lambda it, v: losses.append(v))
    first = losses[0]
    assert last < first * 0.5, (first, last)

    # the distilled student samples with the plain (single-forward) sampler
    task = DiffusionTask(model, TaskConfig(
        timesteps=T, sampling_type="ddim_x0", sampling_steps=9,
        use_megakernel=False))
    x_T = jax.random.normal(jax.random.key(2), (2, 16, 88))
    x0, _ = task.sample(student, x_T, jax.random.key(3),
                        waveform=batch["audio"][:2])
    assert x0.shape == (2, 16, 88) and np.all(np.isfinite(np.asarray(x0)))


def test_progressive_chain_runs(tiny_setup):
    model, params, batch = tiny_setup

    def batches():
        while True:
            yield batch

    cfg = DistillConfig(start_steps=9, stages=2, steps_per_stage=8, lr=1e-3)
    out = progressive_distill(model, SCHED, params, batches(), T, cfg)
    assert sorted(out) == [5, 9]
    for n, p in out.items():
        leaves = jax.tree_util.tree_leaves(p)
        assert all(np.all(np.isfinite(x)) for x in leaves)


def test_distill_loss_packed_batch_parity(tiny_setup):
    """The distill loss accepts packed H2D batches (int16 audio / uint8
    rolls, data/pipeline.pack_batch) and unpacks in-jit — bit-identical
    loss on audio that sits on the int16 PCM grid (the decode precision,
    io/wav._pcm_to_float). Mirrors the supervised-loss contract
    (tests/test_pipeline.py); cli/distill wires this via device_prefetch
    when dataloader.transfer=packed."""
    from diffroll_tpu.data.pipeline import pack_batch

    model, params, _ = tiny_setup
    rng = np.random.RandomState(11)
    pcm = rng.randint(-32768, 32768, size=(4, 16 * 512)).astype(np.float32)
    batch = {
        "frame": (rng.rand(4, 16, 88) > 0.9).astype(np.float32),
        "audio": pcm / 32768.0,
    }
    grid, mid = distill_grids(T, 9)
    loss_fn = make_distill_loss(model, SCHED, params, grid, mid,
                                guided=False, w=0.0)
    key = jax.random.key(5)
    lf = jax.jit(lambda b: loss_fn(params, b, key)[0])
    loss_f32 = float(lf({k: jnp.asarray(v) for k, v in batch.items()}))
    packed = pack_batch(batch)
    assert packed["audio"].dtype == np.int16
    assert packed["frame"].dtype == np.uint8
    loss_packed = float(lf({k: jnp.asarray(v) for k, v in packed.items()}))
    assert loss_packed == loss_f32, (loss_packed, loss_f32)
