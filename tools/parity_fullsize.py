"""Full-size megakernel-vs-scan parity gate (VERDICT r4 item 3).

The committed megakernel parity tests run tiny geometries (CPU interpret
mode, tests/test_sampler_kernel.py); full-size (512ch x 15L, T=200,
640 frames — reference config/model/ClassifierFreeDiffRoll.yaml:3-7)
parity previously rested on an uncommitted round-3 manual A/B. This tool
runs the REAL geometry on the chip: one 200-step cfdg_ddpm_x0 reverse
process through the scan path and through the whole-reverse-process
Pallas megakernel (ops/sampler_kernel.py) under the same key, reports the
trajectory relative error, and records compile + run wall for each path.

Side effect by design: the two programs it compiles are byte-identical to
the driver bench's headline (megakernel e2e) and scan-regression programs,
so running this immediately before a driver round primes the persistent
XLA cache for `bench.py`.

    python tools/parity_fullsize.py [batch=1] [w=0.5] [steps=200]
        [out=PARITY_fullsize.json] [platform=axon]

Exit code 0 iff rel_err < 0.05 (the same gate the unit tests use).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

ARGS = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)


def main() -> int:
    import os

    platform = ARGS.get("platform", os.environ.get("JAX_PLATFORMS", "axon"))
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from diffroll_tpu import models
    from diffroll_tpu.tasks import DiffusionTask, TaskConfig

    from diffroll_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()

    batch = int(ARGS.get("batch", "1"))
    w = float(ARGS.get("w", "0.5"))
    steps = int(ARGS.get("steps", "200"))

    model = models.build("ClassifierFreeDiffRoll")
    frames, pitches = model.config.frames, model.config.pitches
    params = model.init(jax.random.key(0))
    # randomize the zero-init output head so trajectories are non-trivial
    p = params["params"]
    p["output_projection"]["kernel"] = (
        jax.random.normal(jax.random.key(9),
                          p["output_projection"]["kernel"].shape) * 0.1)

    wav = jax.random.normal(jax.random.key(1), (batch, frames * 512))
    x_T = jax.random.normal(jax.random.key(2), (batch, frames, pitches))

    record = {
        "geometry": dict(residual_channels=model.config.residual_channels,
                         residual_layers=model.config.residual_layers,
                         frames=frames, timesteps=steps, batch=batch, w=w),
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }
    rolls = {}
    for name, mk in (("megakernel", True), ("scan", False)):
        cfg = TaskConfig(timesteps=steps, sampling_type="cfdg_ddpm_x0",
                         w=w, use_megakernel=mk)
        task = DiffusionTask(model, cfg)
        if mk:
            record["megakernel_applies"] = bool(task._megakernel_applies())
        run = task.sample_jit(donate=False)
        t0 = time.perf_counter()
        out = jax.block_until_ready(
            run(params, x_T, jax.random.key(3), wav))[0]
        record[f"{name}_first_call_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        for _ in range(3):
            out = jax.block_until_ready(
                run(params, x_T, jax.random.key(3), wav))[0]
        record[f"{name}_warm_latency_s"] = round(
            (time.perf_counter() - t0) / 3, 4)
        rolls[name] = out
        print(f"[parity] {name}: first {record[f'{name}_first_call_s']}s, "
              f"warm {record[f'{name}_warm_latency_s']}s", file=sys.stderr,
              flush=True)

    diff = float(jnp.abs(rolls["megakernel"] - rolls["scan"]).max())
    scale = float(jnp.abs(rolls["scan"]).max()) + 1e-6
    record["abs_err_max"] = round(diff, 6)
    record["rel_err"] = round(diff / scale, 6)
    record["pass"] = record["rel_err"] < 0.05
    print(f"[parity] rel_err={record['rel_err']:.5f} "
          f"({'PASS' if record['pass'] else 'FAIL'})", file=sys.stderr)

    out_path = ARGS.get("out")
    if out_path:
        pathlib.Path(out_path).write_text(json.dumps(record, indent=2) + "\n")
    print(json.dumps(record))
    return 0 if record["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
