"""Benchmark suite: the BASELINE.md metric set, measured on the real chip.

Headline (the driver-parsed fields): 20.48 s clip end-to-end transcription
latency — mel front-end + full 200-step cfdg_ddpm_x0 reverse diffusion
(batched CFG => 200 fused launches instead of the reference's 400 forwards
with a host sync each step, reference task/diffusion.py:779-788, 951-953)
on the flagship ClassifierFreeDiffRoll at full size, batch 1, one chip.
`vs_baseline` is speedup vs the BASELINE.md north-star budget of 1.0 s per
20 s clip (the reference publishes no latency numbers).

The full metric set (BASELINE.md:29-33) rides in "extras" of the SAME
single JSON line:
  * ddpm_steps_per_sec          — sampler reverse steps/sec/chip at B=1
  * ddim50_latency_s            — 50-step strided DDIM e2e latency
  * distilled5_latency_s / _audio_s_per_s_b16 — the progressive-distillation
                                  serving path (ddim_x0@5, guidance folded:
                                  one forward per step; train/distill.py)
  * serving_audio_s_per_s_b16   — batched transcription throughput
  * train_step_ms_b16 / _bf16   — train-step latency (f32 and bf16 compute),
                                  timed INSIDE a lax.scan (the chip sits
                                  behind a ~25 ms dispatch tunnel, so naive
                                  per-step timing measures the tunnel)
  * train_mfu_vs_bf16_peak      — XLA-counted step FLOPs / (step time x
                                  197e12), the v5e bf16 peak
  * host_pipeline_clips_per_sec — DataLoader throughput over an on-disk
                                  synthetic MAPS tree (decode+rasterize),
                                  to compare against train_clips_per_sec
"""

from __future__ import annotations

import json
import pathlib
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

BF16_PEAK_FLOPS = 197e12  # v5e per-chip bf16 peak


def timeit(fn, iters: int = 5, warmup: int = 1) -> float:
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / iters


def bench_sampling(extras):
    from diffroll_tpu import models
    from diffroll_tpu.tasks import DiffusionTask, TaskConfig

    model = models.build("ClassifierFreeDiffRoll")
    frames, pitches = model.config.frames, model.config.pitches

    def e2e(batch, steps, sampling_type=None, w=0.5):
        if sampling_type is None:
            sampling_type = "cfdg_ddpm_x0" if steps is None else "cfdg_ddim_x0"
        task = DiffusionTask(model, TaskConfig(
            timesteps=200, w=w, sampling_type=sampling_type,
            sampling_steps=steps))
        params = model.init(jax.random.key(0))
        wav = jax.random.normal(jax.random.key(1), (batch, frames * 512))
        x_T = jax.random.normal(jax.random.key(2), (batch, frames, pitches))
        run = task.sample_jit(donate=False)
        return timeit(lambda: run(params, x_T, jax.random.key(3), wav))

    dt = e2e(1, None)                       # headline: 200-step CFG DDPM
    extras["ddpm_steps_per_sec"] = round(200.0 / dt, 1)
    extras["ddim50_latency_s"] = round(e2e(1, 50), 4)
    dt16 = e2e(16, None)
    extras["serving_audio_s_per_s_b16"] = round(16 * frames * 512 / 16000 / dt16, 1)

    # the distilled-sampler serving path (train/distill.py): few-step
    # deterministic grid, guidance folded in => ONE forward per step.
    # Latency is weight-independent, so random params measure it exactly;
    # quality evidence lives in examples/synthetic_end_to_end.py distill=1.
    extras["distilled5_latency_s"] = round(
        e2e(1, 5, sampling_type="ddim_x0", w=0.0), 4)
    d16 = e2e(16, 5, sampling_type="ddim_x0", w=0.0)
    extras["distilled5_audio_s_per_s_b16"] = round(
        16 * frames * 512 / 16000 / d16, 1)
    return dt


def bench_train(extras):
    import optax

    from diffroll_tpu import models
    from diffroll_tpu.tasks import DiffusionTask, TaskConfig
    from diffroll_tpu.train import TrainState, make_optimizer

    B, K = 16, 20

    def step_time(dtype, fused_train=None):
        model = models.build("ClassifierFreeDiffRoll", dtype=dtype)
        task = DiffusionTask(model, TaskConfig(timesteps=200,
                                               fused_train=fused_train))
        params = model.init(jax.random.key(0))
        tx = make_optimizer(5e-5)
        state = TrainState.create(params, tx)
        frames = model.config.frames
        batch = {
            "frame": (jax.random.uniform(jax.random.key(1), (B, frames, 88))
                      > 0.9).astype(jnp.float32),
            "audio": jax.random.normal(jax.random.key(2), (B, frames * 512)),
        }

        def inner(state, key):
            (_, (losses, _)), grads = jax.value_and_grad(
                lambda p: task.loss_fn(p, batch, key, True), has_aux=True
            )(state.params)
            updates, opt = tx.update(grads, state.opt_state, state.params)
            return TrainState(step=state.step + 1,
                              params=optax.apply_updates(state.params, updates),
                              opt_state=opt), losses["diffusion_loss"]

        # K chained steps inside ONE dispatch: amortizes the tunnel RTT
        @jax.jit
        def many(state, key):
            return jax.lax.scan(inner, state, jax.random.split(key, K))

        dt = timeit(lambda: many(state, jax.random.key(3)), iters=3) / K

        flops = None
        try:
            cost = jax.jit(inner).lower(state, jax.random.key(0)).compile(
            ).cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0)) or None
        except Exception:
            pass
        return dt, flops

    # default path (per-layer flax stack through XLA autodiff)
    dt32, flops = step_time("float32")
    extras["train_step_ms_b16"] = round(dt32 * 1e3, 2)
    extras["train_clips_per_sec"] = round(B / dt32, 1)
    if flops:
        extras["train_mfu_vs_bf16_peak"] = round(
            flops / (dt32 * BF16_PEAK_FLOPS), 3)
    dt16, _ = step_time("bfloat16")
    extras["train_step_bf16_ms_b16"] = round(dt16 * 1e3, 2)
    # the opt-in custom-VJP fused stack (task.fused_train=true), tracked so
    # regressions/improvements in the training kernels stay visible
    dt_fused, _ = step_time("float32", fused_train=True)
    extras["train_step_fused_ms_b16"] = round(dt_fused * 1e3, 2)


def bench_host_pipeline(extras):
    """Can the host loader feed the chip? Decode+rasterize throughput over
    an on-disk synthetic MAPS tree with realistic note density (~300 notes
    per 20.48 s clip). Reported separately:
      * cold  — first epoch: wav decode + rasterize (disk-bound, once)
      * steady — later epochs: cache-hit window + rasterize (what a
        training run sees; must exceed train_clips_per_sec)"""
    from diffroll_tpu.data.amt import MAPS
    from diffroll_tpu.data.pipeline import DataLoader
    from diffroll_tpu.io import write_midi, write_wav

    B, SR, SEQ, N_CLIPS = 16, 16000, 327680, 32
    with tempfile.TemporaryDirectory() as td:
        d = pathlib.Path(td) / "MAPS" / "AkPnBcht" / "MUS"
        d.mkdir(parents=True)
        rng = np.random.RandomState(0)
        for i in range(N_CLIPS):
            write_wav(d / f"c{i}.wav",
                      rng.randn(SEQ + SR).astype(np.float32) * 0.1, SR)
            onsets = np.sort(rng.uniform(0, 20, 300))
            write_midi(str(d / f"c{i}.mid"),
                       list(rng.randint(21, 109, 300)),
                       [(float(o), float(o + rng.uniform(0.1, 1.0)))
                        for o in onsets])
        ds = MAPS(td, groups="train", sequence_length=SEQ)
        loader = DataLoader(ds, batch_size=B, num_workers=4)

        def one_epoch():
            n, t0 = 0, time.perf_counter()
            for batch in loader:
                n += batch["frame"].shape[0]
            return n / (time.perf_counter() - t0)

        extras["host_pipeline_cold_clips_per_sec"] = round(one_epoch(), 1)
        rates = [one_epoch() for _ in range(4)]
        extras["host_pipeline_clips_per_sec"] = round(
            float(np.median(rates)), 1)


def main():
    extras = {}
    dt = bench_sampling(extras)
    bench_train(extras)
    bench_host_pipeline(extras)

    budget_s = 1.0  # north-star: < 1 s per 20.48 s clip
    print(json.dumps({
        "metric": "e2e_transcription_latency_20s_clip",
        "value": round(dt, 4),
        "unit": "s",
        "vs_baseline": round(budget_s / dt, 3),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
