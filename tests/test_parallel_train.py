"""Mesh / sharded-train-step / checkpoint tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffroll_tpu import models, parallel
from diffroll_tpu.tasks import DiffusionTask, TaskConfig
from diffroll_tpu.train import (
    Checkpointer,
    TrainState,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

B, T, F, TS = 8, 32, 88, 8


@pytest.fixture(scope="module")
def setup():
    model = models.build(
        "ClassifierFreeDiffRoll",
        residual_channels=8, residual_layers=2, frames=T, timesteps=TS,
    )
    params = model.init(jax.random.key(0))
    task = DiffusionTask(model, TaskConfig(timesteps=TS))
    batch = {
        "frame": (jax.random.uniform(jax.random.key(1), (B, T, F)) > 0.9).astype(
            jnp.float32
        ),
        "audio": jax.random.normal(jax.random.key(2), (B, T * 512)),
    }
    return model, params, task, batch


def test_mesh_shapes():
    mesh = parallel.make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = parallel.make_mesh(model=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2
    with pytest.raises(ValueError):
        parallel.make_mesh(model=3)


def test_shard_batch_tail_replicates():
    """A tail batch whose leading dim does not divide the data axis (val
    loaders keep partial last batches) must place REPLICATED instead of
    raising the device_put divisibility error."""
    mesh = parallel.make_mesh()
    full = {"x": jnp.ones((8, 4)), "y": jnp.ones((8,))}
    tail = {"x": jnp.ones((3, 4)), "y": jnp.ones((3,))}
    sfull = parallel.shard_batch(mesh, full)
    assert sfull["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    stail = parallel.shard_batch(mesh, tail)  # would raise before the fix
    assert stail["x"].sharding.spec == jax.sharding.PartitionSpec()
    np.testing.assert_array_equal(np.asarray(stail["x"]), np.ones((3, 4)))


def test_dp_train_step_on_mesh(setup):
    model, params, task, batch = setup
    mesh = parallel.make_mesh()
    tx = make_optimizer(1e-3)
    state = TrainState.create(params, tx)
    state = jax.device_put(
        state,
        TrainState(
            step=parallel.replicated(mesh),
            params=parallel.param_sharding(mesh, state.params),
            opt_state=parallel.param_sharding(mesh, state.opt_state),
        ),
    )
    sbatch = parallel.shard_batch(mesh, batch)
    step = make_train_step(task.loss_fn, tx, mesh=mesh, state_example=state,
                           donate_state=False)
    state2, losses = step(state, sbatch, jax.random.key(3))
    assert int(state2.step) == 1
    assert np.isfinite(float(losses["diffusion_loss"]))
    # batch leaves actually sharded over 8 devices
    assert len(sbatch["frame"].sharding.device_set) == 8


def test_dp_matches_single_device(setup):
    """The mesh step must compute the same update as a single-device step."""
    model, params, task, batch = setup
    tx = make_optimizer(1e-3)

    mesh = parallel.make_mesh()
    state_m = TrainState.create(params, tx)
    step_m = make_train_step(task.loss_fn, tx, mesh=mesh, state_example=state_m,
                             donate_state=False)
    out_m, losses_m = step_m(
        jax.device_put(
            state_m,
            TrainState(
                step=parallel.replicated(mesh),
                params=parallel.param_sharding(mesh, state_m.params),
                opt_state=parallel.param_sharding(mesh, state_m.opt_state),
            ),
        ),
        parallel.shard_batch(mesh, batch),
        jax.random.key(3),
    )

    state_s = TrainState.create(params, tx)
    step_s = make_train_step(task.loss_fn, tx, donate_state=False)
    out_s, losses_s = step_s(state_s, batch, jax.random.key(3))

    np.testing.assert_allclose(
        float(losses_m["diffusion_loss"]), float(losses_s["diffusion_loss"]),
        rtol=1e-5,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(out_m.params), jax.tree_util.tree_leaves(out_s.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_tensor_parallel_axis(setup):
    """model=2 mesh: channel-divisible params shard over 'model'; the step
    still runs and matches the replicated result."""
    model, params, task, batch = setup
    mesh = parallel.make_mesh(model=2)
    shardings = parallel.param_sharding(mesh, params)
    sharded_any = any(
        len(s.spec) > 0 for s in jax.tree_util.tree_leaves(shardings)
    )
    assert sharded_any, "expected at least one tensor-parallel param"

    tx = make_optimizer(1e-3)
    state = TrainState.create(params, tx)
    state = jax.device_put(
        state,
        TrainState(
            step=parallel.replicated(mesh),
            params=shardings,
            opt_state=parallel.param_sharding(mesh, state.opt_state),
        ),
    )
    step = make_train_step(task.loss_fn, tx, mesh=mesh, state_example=state,
                           donate_state=False)
    state2, losses = step(state, parallel.shard_batch(mesh, batch), jax.random.key(3))
    assert np.isfinite(float(losses["diffusion_loss"]))


def test_eval_step(setup):
    model, params, task, batch = setup
    ev = make_eval_step(task.loss_fn)
    losses = ev(params, batch, jax.random.key(4))
    assert np.isfinite(float(losses["diffusion_loss"]))


def test_checkpoint_roundtrip(tmp_path, setup):
    model, params, task, batch = setup
    tx = make_optimizer(1e-3)
    state = TrainState.create(params, tx)
    ck = Checkpointer(tmp_path / "ckpt", max_to_keep=2)
    ck.save(0, state, {"model": model.config, "task": task.config})
    step = make_train_step(task.loss_fn, tx, donate_state=False)
    state1, _ = step(state, batch, jax.random.key(3))
    ck.save(1, state1, {"model": model.config, "task": task.config})
    ck.wait()

    assert ck.latest_step() == 1
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
    )
    restored, cfg = ck.load(abstract)
    assert int(restored.step) == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state1.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert cfg["model"].residual_channels == 8
    assert cfg["task"].timesteps == TS

    # override-on-load semantics (reference test.py:29-36)
    _, cfg2 = ck.load(abstract, frame_threshold=0.9, w=1.5)
    assert cfg2["task"].frame_threshold == 0.9
    assert cfg2["task"].w == 1.5


def test_checkpoint_gc(tmp_path, setup):
    model, params, task, _ = setup
    tx = make_optimizer(1e-3)
    state = TrainState.create(params, tx)
    ck = Checkpointer(tmp_path / "ckpt", max_to_keep=2)
    for s in range(4):
        ck.save(s, state)
    ck.wait()
    kept = sorted(p.name for p in (tmp_path / "ckpt").glob("step_*"))
    assert kept == ["step_000000002", "step_000000003"]


def test_ema_tracking_and_eval_preference(tmp_path):
    """TrainerConfig.ema_decay tracks an EMA beside the state; checkpoints
    carry it as an extra, and load_extra restores it."""
    import jax
    import jax.numpy as jnp

    from diffroll_tpu import models
    from diffroll_tpu.config.experiment import TrainerConfig
    from diffroll_tpu.tasks import DiffusionTask, TaskConfig
    from diffroll_tpu.train import (
        Checkpointer,
        TrainState,
        fit,
        make_optimizer,
    )

    model = models.build("ClassifierFreeDiffRoll", residual_channels=8,
                         residual_layers=2, frames=16, timesteps=4)
    task = DiffusionTask(model, TaskConfig(timesteps=4))
    params = model.init(jax.random.key(0))
    tx = make_optimizer(1e-2)
    state = TrainState.create(params, tx)

    batch = {
        "frame": (jax.random.uniform(jax.random.key(1), (2, 16, 88)) > 0.8
                  ).astype(jnp.float32),
        "audio": jax.random.normal(jax.random.key(2), (2, 16 * 512)),
    }
    loader = [batch, batch]
    ckpt = Checkpointer(tmp_path / "ck")
    state = fit(task, state, loader, tx,
                trainer=TrainerConfig(max_epochs=2, check_val_every_n_epoch=1,
                                      monitor="train/diffusion_loss",
                                      ema_decay=0.5, log_every_n_steps=1),
                checkpointer=ckpt)

    abstract = jax.eval_shape(lambda: state)
    ema = ckpt.load_extra("ema", abstract.params)
    assert ema is not None
    # ema lags behind the raw params (decay 0.5 over 4 steps)
    diff = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree_util.tree_map(lambda e, p: e - p, ema, state.params), 0.0)
    assert diff > 0.0


def test_monitor_resolution_by_prefix():
    """'train/x' monitors read train losses even when a val loader exists
    (the unsupervised-pretrain recipe); 'val/x' reads val losses."""
    from diffroll_tpu.train.loop import _resolve_monitor

    train = {"diffusion_loss": 0.25}
    val = {"diffusion_loss": 0.5}
    assert _resolve_monitor("train/diffusion_loss", train, val) == 0.25
    assert _resolve_monitor("val/diffusion_loss", train, val) == 0.5
    assert _resolve_monitor("diffusion_loss", train, val) == 0.5  # bare = val
    assert _resolve_monitor("train/nope", train, val) is None
    assert _resolve_monitor("val/nope", train, val) is None


def test_train_monitor_saves_best_despite_val_loader(tmp_path):
    """Best-checkpoint saves must fire for monitor='train/diffusion_loss'
    even when a val_loader is present (round-1 advisor finding: the
    lookup went to val_losses and never resolved)."""
    import jax
    import jax.numpy as jnp

    from diffroll_tpu import models
    from diffroll_tpu.config.experiment import TrainerConfig
    from diffroll_tpu.tasks import DiffusionTask, TaskConfig
    from diffroll_tpu.train import (
        Checkpointer,
        TrainState,
        fit,
        make_optimizer,
    )

    model = models.build("ClassifierFreeDiffRoll", residual_channels=8,
                         residual_layers=2, frames=16, timesteps=4)
    task = DiffusionTask(model, TaskConfig(timesteps=4))
    params = model.init(jax.random.key(0))
    tx = make_optimizer(1e-2)
    state = TrainState.create(params, tx)
    batch = {
        "frame": (jax.random.uniform(jax.random.key(1), (2, 16, 88)) > 0.8
                  ).astype(jnp.float32),
        "audio": jax.random.normal(jax.random.key(2), (2, 16 * 512)),
    }
    ckpt = Checkpointer(tmp_path / "ck")
    fit(task, state, [batch], tx,
        trainer=TrainerConfig(max_epochs=1, check_val_every_n_epoch=1,
                              monitor="train/diffusion_loss",
                              log_every_n_steps=1),
        val_loader=[batch],
        checkpointer=ckpt)
    ckpt.wait()
    steps = [p.name for p in (tmp_path / "ck").iterdir()]
    assert any(s.startswith("step_") and "last" not in s for s in steps), steps


def test_fused_adam_matches_optax_chain():
    """make_optimizer returns an AdamTx whose fused one-pass update
    (train/state.fused_adam_apply, used by make_train_step) matches
    optax.adam's update+apply composition over several steps."""
    import numpy as np
    import optax

    from diffroll_tpu.train.state import (AdamTx, fused_adam_apply,
                                          make_optimizer)

    rng = np.random.RandomState(0)
    params = {"a": jnp.asarray(rng.randn(17, 5), jnp.float32),
              "b": {"w": jnp.asarray(rng.randn(8), jnp.float32)}}
    tx = make_optimizer(3e-4)
    assert isinstance(tx, AdamTx)
    opt, ref_opt, ref_params = tx.init(params), tx.init(params), params
    for _ in range(5):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32), params)
        params, opt = fused_adam_apply(tx, params, grads, opt)
        u, ref_opt = tx.update(grads, ref_opt, ref_params)
        ref_params = optax.apply_updates(ref_params, u)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-7),
        params, ref_params)
    np.testing.assert_array_equal(np.asarray(opt[0].count),
                                  np.asarray(ref_opt[0].count))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-7),
        opt[0].nu, ref_opt[0].nu)


def test_stochastic_round_unbiased_and_exact():
    """bf16 stochastic rounding: exactly-representable values round
    exactly; values between bf16 neighbours round UP with probability
    proportional to the fractional position (unbiased in expectation) —
    the property that prevents the classic bf16-Adam moment stall."""
    import numpy as np

    from diffroll_tpu.train.state import _stochastic_round

    exact = jnp.asarray([1.0, -2.5, 0.0, 0.15625], jnp.float32)
    for i in range(4):
        out = _stochastic_round(exact, jnp.bfloat16, jax.random.key(i))
        np.testing.assert_array_equal(np.asarray(out, np.float32),
                                      np.asarray(exact))

    # x sits 1/4 of the way from 1.0 to the next bf16 (ulp at 1.0 is 2^-7:
    # bf16 keeps a 7-bit mantissa): expect ~25% round-up
    x = jnp.full((20000,), 1.0 + 0.25 * 2.0 ** -7, jnp.float32)
    out = np.asarray(
        _stochastic_round(x, jnp.bfloat16, jax.random.key(42)), np.float32)
    frac_up = (out > 1.0).mean()
    assert 0.22 < frac_up < 0.28, frac_up
    # and the mean is unbiased to well under an ulp
    assert abs(out.mean() - float(x[0])) < 2.0 ** -11


def test_fused_adam_bf16_moments_tracks_f32():
    """moments_dtype='bfloat16': mu/nu live in bf16 (init and after
    updates), and several steps of the packed update stay close to the
    f32 reference trajectory."""
    import numpy as np

    from diffroll_tpu.train.state import fused_adam_apply, make_optimizer

    rng = np.random.RandomState(1)
    params = {"a": jnp.asarray(rng.randn(33, 9), jnp.float32),
              "b": {"w": jnp.asarray(rng.randn(16), jnp.float32)}}
    tx16 = make_optimizer(1e-3, moments_dtype="bfloat16")
    tx32 = make_optimizer(1e-3)
    opt16, opt32 = tx16.init(params), tx32.init(params)
    assert opt16[0].mu["a"].dtype == jnp.bfloat16
    assert opt16[0].nu["b"]["w"].dtype == jnp.bfloat16

    p16 = p32 = params
    for _ in range(10):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32), params)
        p16, opt16 = fused_adam_apply(tx16, p16, grads, opt16)
        p32, opt32 = fused_adam_apply(tx32, p32, grads, opt32)
    assert opt16[0].mu["a"].dtype == jnp.bfloat16
    # parameter drift after 10 steps stays within a few bf16 ulps of the
    # update magnitude (lr=1e-3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4),
        p16, p32)


def test_train_step_with_packed_moments_and_rbg(tmp_path):
    """End-to-end: the train CLI runs with adam_moments_dtype=bfloat16 and
    rng_impl=rbg (the two opt-in overhead knobs) and the loss decreases."""
    import json as _json

    import numpy as np

    from diffroll_tpu.cli import train as train_cli
    from diffroll_tpu.io import write_midi, write_wav

    SR, HOP, FRAMES = 16000, 512, 32
    SEQ = FRAMES * HOP
    d = tmp_path / "MAPS" / "AkPnBcht" / "MUS"
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(8):
        write_wav(d / f"c{i}.wav", rng.randn(SEQ).astype(np.float32) * 0.1,
                  SR)
        write_midi(str(d / f"c{i}.mid"), [60, 72], [(0.1, 0.5), (0.6, 0.9)])
    (tmp_path / "MAPS" / "ENSTDkAm" / "MUS").mkdir(parents=True)

    train_cli.main([
        "spec_roll", f"dataset.root={tmp_path}",
        "model.residual_channels=8", "model.residual_layers=2",
        f"model.frames={FRAMES}", "task.timesteps=4",
        f"dataset.sequence_length={SEQ}", "task.lr=2e-3",
        "dataloader.train_batch_size=8", "dataloader.num_workers=1",
        "trainer.max_epochs=30", "trainer.check_val_every_n_epoch=100",
        "trainer.log_every_n_steps=1",  # 1 step/epoch here; default is 50
        "trainer.adam_moments_dtype=bfloat16", "trainer.rng_impl=rbg",
        f"trainer.output_dir={tmp_path / 'out'}",
    ])
    logs = sorted((tmp_path / "out").rglob("metrics.jsonl"))
    assert logs
    rows = [_json.loads(l) for l in logs[0].read_text().splitlines()]
    losses = [r["train/diffusion_loss"] for r in rows
              if "train/diffusion_loss" in r]
    assert len(losses) >= 2
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])


def test_fit_with_packed_transfer():
    """fit(transfer='packed') routes batches through pack_batch on the H2D
    path and loss_fn unpacks in-jit — two epochs must run and update
    params exactly like the float32 path (same seed, PCM-grid audio)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from diffroll_tpu import models
    from diffroll_tpu.config.experiment import TrainerConfig
    from diffroll_tpu.tasks import DiffusionTask, TaskConfig
    from diffroll_tpu.train import TrainState, fit, make_optimizer

    model = models.build("ClassifierFreeDiffRoll", residual_channels=8,
                         residual_layers=2, frames=16, timesteps=4)
    task = DiffusionTask(model, TaskConfig(timesteps=4))
    rng = np.random.RandomState(0)
    pcm = rng.randint(-3000, 3000, size=(2, 16 * 512)).astype(np.int16)
    batch = {
        "frame": (rng.rand(2, 16, 88) > 0.8).astype(np.float32),
        "audio": pcm.astype(np.float32) / 32768.0,
    }
    tcfg = TrainerConfig(max_epochs=2, check_val_every_n_epoch=5,
                         monitor="train/diffusion_loss", log_every_n_steps=1)

    def run(transfer):
        params = model.init(jax.random.key(0))
        state = TrainState.create(params, make_optimizer(1e-2))
        return fit(task, state, [batch, batch], make_optimizer(1e-2),
                   trainer=tcfg, transfer=transfer)

    s_f32 = run("float32")
    s_packed = run("packed")
    max_diff = jax.tree_util.tree_reduce(
        lambda a, b: max(a, float(jnp.abs(b).max())),
        jax.tree_util.tree_map(lambda x, y: x - y,
                               s_f32.params, s_packed.params), 0.0)
    assert max_diff == 0.0, max_diff
