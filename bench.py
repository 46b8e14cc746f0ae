"""Headline benchmark: 20.48 s clip end-to-end transcription latency.

Measures mel front-end + full 200-step cfdg_ddpm_x0 reverse diffusion
(batched CFG => 200 fused launches instead of the reference's 400 forwards
with a host sync each step, reference task/diffusion.py:779-788, 951-953)
on the flagship ClassifierFreeDiffRoll at full size, batch 1, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is speedup vs the BASELINE.md north-star budget of 1.0 s
per 20 s clip (the reference publishes no latency numbers; BASELINE.json
north_star: "<1s on v5e-8").
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from diffroll_tpu import models
    from diffroll_tpu.tasks import DiffusionTask, TaskConfig

    model = models.build("ClassifierFreeDiffRoll")
    task = DiffusionTask(model, TaskConfig(timesteps=200, w=0.5,
                                           sampling_type="cfdg_ddpm_x0"))
    params = model.init(jax.random.key(0))

    b, frames, pitches = 1, model.config.frames, model.config.pitches
    waveform = jax.random.normal(jax.random.key(1), (b, frames * 512))
    x_T = jax.random.normal(jax.random.key(2), (b, frames, pitches))

    run = task.sample_jit(donate=False)
    # compile + warmup
    run(params, x_T, jax.random.key(3), waveform).block_until_ready()

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        run(params, x_T, jax.random.key(10 + i), waveform).block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    budget_s = 1.0  # north-star: < 1 s per 20.48 s clip
    print(json.dumps({
        "metric": "e2e_transcription_latency_20s_clip",
        "value": round(dt, 4),
        "unit": "s",
        "vs_baseline": round(budget_s / dt, 3),
    }))


if __name__ == "__main__":
    main()
