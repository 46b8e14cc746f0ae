"""Tests for the whole-process sampler kernel (ops/sampler_kernel.py):
the linear per-step tables against the real step functions, and the
Pallas kernel (interpret mode) against the scan sampling path at the
task level, across sampler families."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffroll_tpu import models
from diffroll_tpu.diffusion.loop import sample_loop, timestep_subsequence
from diffroll_tpu.diffusion.samplers import SAMPLER_TABLE
from diffroll_tpu.diffusion.schedule import linear_schedule
from diffroll_tpu.ops.sampler_kernel import sampler_tables
from diffroll_tpu.tasks import DiffusionTask, TaskConfig

T = 16


@pytest.mark.parametrize("name", sorted(SAMPLER_TABLE))
@pytest.mark.parametrize("steps", [None, 6])
def test_linear_tables_match_step_functions(name, steps):
    """x <- a*pred + b*x + s*noise reproduces the real sampler step
    trajectory under shared noise (pred fed back from a fixed fake model,
    so coefficient errors compound and can't hide)."""
    sched = linear_schedule(1e-4, 0.02, T)
    B, F, P = 2, 8, 88
    rng = np.random.RandomState(0)
    Wm = jnp.asarray(rng.randn(P, P).astype(np.float32) * 0.1)

    def fake_pred(x, t):
        return jnp.tanh(x @ Wm) * (1.0 + 0.01 * t)

    step_fn = SAMPLER_TABLE[name][0]

    def step(x, t, tp, key):
        return step_fn(sched, x, t, fake_pred(x, t), key, t_prev=tp)

    x_T = jax.random.normal(jax.random.key(1), (B, F, P))
    key = jax.random.key(2)
    ref, _ = jax.jit(
        lambda x, k: sample_loop(step, x, T, k, steps=steps))(x_T, key)

    ts = timestep_subsequence(T, steps)
    tsp = np.concatenate([ts[1:], [-1]]).astype(np.int32)
    tab = jnp.asarray(sampler_tables(sched, name, ts, tsp))
    keys = jax.random.split(key, len(ts))
    noise = jax.vmap(lambda k: jax.random.normal(k, x_T.shape))(keys)

    @jax.jit
    def linear(x):
        def body(x, inp):
            t, coeffs, n = inp
            pred = fake_pred(x, t)
            return coeffs[0] * pred + coeffs[1] * x + coeffs[2] * n, None
        out, _ = jax.lax.scan(body, x, (jnp.asarray(ts), tab, noise))
        return out

    got = linear(x_T)
    # pure f32 reassociation: the tables are evaluated in f64 while the
    # step fns compose the same coefficients in f32
    assert float(jnp.abs(ref - got).max()) < 5e-3, name


CASES = [
    ("cfdg_ddpm_x0", None, {}),
    ("cfdg_ddim_x0", 5, {}),
    ("ddpm_x0", None, {}),
    ("generation_ddpm_x0", None, {}),
    ("inpainting_ddpm_x0", None, {"inpainting_t": (4, 12)}),
    ("ddpm", None, {}),
    ("ddim", 4, {}),
]


@pytest.fixture(scope="module")
def tiny_model():
    model = models.build("ClassifierFreeDiffRoll", residual_channels=16,
                         residual_layers=4, frames=32, timesteps=12)
    params = model.init(jax.random.key(0))
    # randomize the zero-init head so trajectories are non-trivial
    p = params["params"]
    p["output_projection"]["kernel"] = jax.random.normal(
        jax.random.key(9), p["output_projection"]["kernel"].shape) * 0.1
    return model, params


@pytest.mark.parametrize("name,steps,extra", CASES,
                         ids=[c[0] + str(c[1]) for c in CASES])
def test_megakernel_matches_scan_path(tiny_model, name, steps, extra):
    """task.sample with use_megakernel=True (interpret mode off-TPU) is
    trajectory-equivalent to the scan path under the same key."""
    model, params = tiny_model
    wav = jax.random.normal(jax.random.key(1), (2, 32 * 512))
    x_T = jax.random.normal(jax.random.key(2), (2, 32, 88))
    cfg = TaskConfig(timesteps=12, sampling_type=name, w=0.5,
                     sampling_steps=steps, **extra)
    a, _ = DiffusionTask(model, cfg.replace(use_megakernel=False)).sample(
        params, x_T, jax.random.key(3), waveform=wav)
    b, _ = DiffusionTask(model, cfg.replace(use_megakernel=True)).sample(
        params, x_T, jax.random.key(3), waveform=wav)
    rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-6)
    assert rel < 0.05, (name, rel)


@pytest.mark.parametrize("name,w", [("ddpm_x0", 0.0), ("cfdg_ddpm_x0", 0.5)])
def test_megakernel_batch_one(tiny_model, name, w):
    """B=1 is the headline serving shape and the only bc=1 tile geometry
    (unguided single stream): the flattened-row dots must stay
    trajectory-equivalent to the scan path there too (bench b1_split_*)."""
    model, params = tiny_model
    wav = jax.random.normal(jax.random.key(1), (1, 32 * 512))
    x_T = jax.random.normal(jax.random.key(2), (1, 32, 88))
    cfg = TaskConfig(timesteps=12, sampling_type=name, w=w)
    a, _ = DiffusionTask(model, cfg.replace(use_megakernel=False)).sample(
        params, x_T, jax.random.key(3), waveform=wav)
    b, _ = DiffusionTask(model, cfg.replace(use_megakernel=True)).sample(
        params, x_T, jax.random.key(3), waveform=wav)
    rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-6)
    assert rel < 0.05, (name, rel)


@pytest.mark.parametrize("knobs", [
    dict(hoist_cond=False),            # per-step conditioner projection
    dict(diag="nowosplit"),            # single-dot out projection
    dict(merge_taps=True, hoist_cond=False),  # concatenated-tap dot
], ids=["nohoist", "nowosplit", "mergetaps"])
def test_megakernel_offdefault_variants_match(tiny_model, knobs):
    """The kernel's off-default A/B paths (per-step conditioner
    projection, un-split out projection, merged-tap dot) must stay
    trajectory-equivalent to the scan path — they exist for profiler
    A/Bs (PROFILE_r03.md) and rot silently otherwise."""
    import functools

    import diffroll_tpu.ops.sampler_kernel as sk

    model, params = tiny_model
    wav = jax.random.normal(jax.random.key(1), (2, 32 * 512))
    x_T = jax.random.normal(jax.random.key(2), (2, 32, 88))
    cfg = TaskConfig(timesteps=12, sampling_type="cfdg_ddpm_x0", w=0.5)
    a, _ = DiffusionTask(model, cfg.replace(use_megakernel=False)).sample(
        params, x_T, jax.random.key(3), waveform=wav)
    orig = sk.fused_sample_pallas
    sk.fused_sample_pallas = functools.partial(orig, **knobs)
    try:
        b, _ = DiffusionTask(model, cfg.replace(use_megakernel=True)).sample(
            params, x_T, jax.random.key(3), waveform=wav)
    finally:
        sk.fused_sample_pallas = orig
    rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-6)
    assert rel < 0.05, (knobs, rel)


@pytest.mark.parametrize("u", [2, 4])
def test_megakernel_step_unroll_matches(tiny_model, u):
    """steps_per_block unrolls u reverse steps per grid iteration (the
    ~180us/grid-step machinery amortization); trajectories must be
    unchanged for stochastic AND deterministic samplers."""
    import functools

    import diffroll_tpu.ops.sampler_kernel as sk

    model, params = tiny_model
    wav = jax.random.normal(jax.random.key(1), (2, 32 * 512))
    x_T = jax.random.normal(jax.random.key(2), (2, 32, 88))
    for name, steps in [("cfdg_ddpm_x0", None), ("ddim", 4 if u == 2 else None)]:
        cfg = TaskConfig(timesteps=12, sampling_type=name, w=0.5,
                         sampling_steps=steps)
        a, _ = DiffusionTask(model, cfg.replace(use_megakernel=False)).sample(
            params, x_T, jax.random.key(3), waveform=wav)
        orig = sk.fused_sample_pallas
        sk.fused_sample_pallas = functools.partial(orig, steps_per_block=u)
        try:
            b, _ = DiffusionTask(model, cfg.replace(
                use_megakernel=True)).sample(
                params, x_T, jax.random.key(3), waveform=wav)
        finally:
            sk.fused_sample_pallas = orig
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-6)
        assert rel < 0.05, (name, u, rel)


def test_megakernel_unroll_must_divide():
    """An explicit steps_per_block that does not divide the step count is
    a hard error (the auto path falls back to 1 instead)."""
    import functools

    import diffroll_tpu.ops.sampler_kernel as sk

    model = models.build("ClassifierFreeDiffRoll", residual_channels=16,
                         residual_layers=2, frames=32, timesteps=12)
    params = model.init(jax.random.key(0))
    wav = jax.random.normal(jax.random.key(1), (1, 32 * 512))
    x_T = jax.random.normal(jax.random.key(2), (1, 32, 88))
    cfg = TaskConfig(timesteps=12, sampling_type="cfdg_ddim_x0",
                     sampling_steps=5, w=0.5)
    task = DiffusionTask(model, cfg.replace(use_megakernel=True))
    orig = sk.fused_sample_pallas
    sk.fused_sample_pallas = functools.partial(orig, steps_per_block=2)
    try:
        with pytest.raises(ValueError, match="must divide"):
            task.sample(params, x_T, jax.random.key(3), waveform=wav)
    finally:
        sk.fused_sample_pallas = orig
    # auto: 5-step grid quietly runs un-unrolled
    out, _ = task.sample(params, x_T, jax.random.key(3), waveform=wav)
    assert out.shape == x_T.shape


def test_megakernel_batch_tiling(tiny_model):
    """Batches above the in-kernel tile split over the grid's batch dim;
    every tile must match the untiled scan result."""
    model, params = tiny_model
    B = 6  # guided tile is 2 -> 3 tiles
    wav = jax.random.normal(jax.random.key(1), (B, 32 * 512))
    x_T = jax.random.normal(jax.random.key(2), (B, 32, 88))
    cfg = TaskConfig(timesteps=12, sampling_type="cfdg_ddpm_x0", w=0.5)
    a, _ = DiffusionTask(model, cfg.replace(use_megakernel=False)).sample(
        params, x_T, jax.random.key(3), waveform=wav)
    b, _ = DiffusionTask(model, cfg.replace(use_megakernel=True)).sample(
        params, x_T, jax.random.key(3), waveform=wav)
    rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-6)
    assert rel < 0.05, rel


def test_megakernel_unconditional():
    model = models.build("DiffRoll", residual_channels=16,
                         residual_layers=3, frames=32, timesteps=10,
                         unconditional=True)
    params = model.init(jax.random.key(0))
    p = params["params"]
    p["output_projection"]["kernel"] = jax.random.normal(
        jax.random.key(9), p["output_projection"]["kernel"].shape) * 0.1
    x_T = jax.random.normal(jax.random.key(2), (2, 32, 88))
    cfg = TaskConfig(timesteps=10, sampling_type="ddpm_x0")
    a, _ = DiffusionTask(model, cfg.replace(use_megakernel=False)).sample(
        params, x_T, jax.random.key(3))
    b, _ = DiffusionTask(model, cfg.replace(use_megakernel=True)).sample(
        params, x_T, jax.random.key(3))
    rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-6)
    assert rel < 0.05, rel


def test_megakernel_shard_map_over_data_axis():
    """With a mesh, the megakernel runs per-shard under shard_map: the
    output stays sharded over 'data' (XLA has no partitioning rule for
    pallas_call — unsharded it would replicate the full batch on every
    device) and matches the scan path."""
    from diffroll_tpu.parallel.mesh import batch_sharding, make_mesh

    model = models.build("ClassifierFreeDiffRoll", residual_channels=16,
                         residual_layers=2, frames=16, timesteps=T)
    params = model.init(jax.random.key(0))
    head = params["params"]["output_projection"]
    head["kernel"] = 0.05 * jax.random.normal(jax.random.key(9),
                                              head["kernel"].shape)
    mesh = make_mesh(data=len(jax.devices()), model=1, devices=jax.devices())
    x_T = jax.random.normal(jax.random.key(2), (8, 16, 88))
    wav = jax.random.normal(jax.random.key(1), (8, 16 * 512))
    xs = jax.device_put(x_T, batch_sharding(mesh))
    ws = jax.device_put(wav, batch_sharding(mesh))

    kw = dict(timesteps=T, sampling_type="cfdg_ddpm_x0", w=0.5)
    mk = DiffusionTask(model, TaskConfig(use_megakernel=True, **kw))
    sc = DiffusionTask(model, TaskConfig(use_megakernel=False, **kw))
    out = jax.block_until_ready(
        mk.sample_jit(donate=False, mesh=mesh)(params, xs, jax.random.key(3),
                                               ws))
    ref = sc.sample(params, x_T, jax.random.key(3), waveform=wav)[0]
    assert "data" in str(out.sharding.spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)
