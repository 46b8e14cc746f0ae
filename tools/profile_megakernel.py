"""Megakernel variant profiler: times ops/sampler_kernel.py knob combos
(merge_taps, hoist_cond, steps_per_block, diag ablations) on the real chip
at the batch shapes that matter — B=1 guided CFG (the headline), B=1
single-stream, B=16 serving.

The round-2 kernel's per-step cost fits t(bc) = 174us + 238us*bc (bc =
denoiser streams through the stack): the marginal stream runs at ~97% of
the MXU ideal but a fixed ~174us/step of latency (serial layer-chain
bubbles) dominates B=1. The knobs attack exactly that fixed term; `diag`
ablates named kernel pieces (output garbage — timing only) to attribute
what remains.

Usage:
  python -u tools/profile_megakernel.py SHAPE [k=v ...] [SHAPE [k=v ...]]
    SHAPE in {b1_cfg, b1_single, b16_cfg}; following k=v apply to it:
      u=N hoist=0|1 merge=0|1 diag=tok[,tok...] iters=N
  e.g.  python -u tools/profile_megakernel.py b1_cfg u=2 b1_cfg u=2 diag=nohead
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

SHAPES = {
    "b1_cfg": dict(batch=1),
    "b1_single": dict(batch=1, sampling_type="ddpm_x0", w=0.0),
    "b16_cfg": dict(batch=16),
}


def main():
    from diffroll_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache(min_compile_time_secs=5)

    # parse [shape, overrides...] groups
    jobs = []
    for tok in sys.argv[1:]:
        if tok in SHAPES:
            jobs.append((tok, {}))
        elif "=" in tok and jobs:
            k, v = tok.split("=", 1)
            jobs[-1][1][k] = v
        else:
            raise SystemExit(f"unknown arg {tok!r}")
    if not jobs:
        jobs = [(s, {}) for s in SHAPES]

    import functools

    from diffroll_tpu import models
    from diffroll_tpu.tasks import DiffusionTask, TaskConfig
    import diffroll_tpu.ops.sampler_kernel as sk

    model = models.build("ClassifierFreeDiffRoll")
    frames, pitches = model.config.frames, model.config.pitches
    params = model.init(jax.random.key(0))
    orig = sk.fused_sample_pallas

    def timeit(fn, iters):
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(fn())
        return (time.perf_counter() - t0) / iters

    def e2e(batch, iters, sampling_type="cfdg_ddpm_x0", w=0.5):
        task = DiffusionTask(model, TaskConfig(
            timesteps=200, w=w, sampling_type=sampling_type,
            use_megakernel=True))
        wav = jax.random.normal(jax.random.key(1), (batch, frames * 512))
        x_T = jax.random.normal(jax.random.key(2), (batch, frames, pitches))
        run = task.sample_jit(donate=False)
        return timeit(lambda: run(params, x_T, jax.random.key(3), wav),
                      iters)

    results = {}
    for tag, ov in jobs:
        kw = dict(SHAPES[tag])
        iters = int(ov.pop("iters", 5))
        knobs = {}
        if "u" in ov:
            knobs["steps_per_block"] = int(ov.pop("u"))
        if "hoist" in ov:
            knobs["hoist_cond"] = bool(int(ov.pop("hoist")))
        if "merge" in ov:
            knobs["merge_taps"] = bool(int(ov.pop("merge")))
        if "diag" in ov:
            knobs["diag"] = ov.pop("diag")
        if ov:
            raise SystemExit(f"unknown overrides {ov}")
        name = tag + "".join(f"[{k}={v}]" for k, v in sorted(knobs.items()))
        sk.fused_sample_pallas = (functools.partial(orig, **knobs)
                                  if knobs else orig)
        try:
            dt = e2e(iters=iters, **kw)
            results[name] = round(dt, 4)
            print(f"{name}: {dt:.4f} s", flush=True)
        except Exception as e:  # Mosaic OOM etc: record, continue
            results[name] = f"{type(e).__name__}: {e}"[:200]
            print(f"{name}: FAILED {results[name]}", flush=True)
        finally:
            sk.fused_sample_pallas = orig

    print(json.dumps(results))


if __name__ == "__main__":
    main()
