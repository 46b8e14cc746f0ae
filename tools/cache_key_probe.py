"""Persistent-compile-cache key probe (r5 cache-miss investigation).

Observed on the single-chip tunnel: the SAME full-size headline program
(megakernel CFG DDPM, B=1) hit the persistent cache in one run and missed
in another minutes later, despite byte-identical lowered StableHLO across
processes and hash seeds. jax's cache key hashes, besides the computation:
jaxlib version, backend platform_version, XLA flags, compile options, and
the accelerator config derived from the device list — a tunnel backend
that reports a session-dependent platform_version (or device attributes)
rotates every key when the remote endpoint restarts.

This probe lowers the real headline program, recomputes its cache key with
per-component sha256 checkpoints, prints them, and checks whether the final
key exists in the cache dir. Run it twice (fresh processes) to test process
determinism; run it again after a suspected tunnel restart to identify the
rotating component.

    python tools/cache_key_probe.py [small=1]
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

ARGS = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)


def main():
    import numpy as np

    import jax

    from diffroll_tpu.utils.compile_cache import enable as enable_compile_cache
    cache = enable_compile_cache()

    from jax._src import cache_key

    from diffroll_tpu import models
    from diffroll_tpu.tasks import DiffusionTask, TaskConfig

    kwargs = {}
    if ARGS.get("small") == "1":
        kwargs = dict(residual_channels=64, residual_layers=4, frames=128)
    model = models.build("ClassifierFreeDiffRoll", **kwargs)
    task = DiffusionTask(model, TaskConfig(
        timesteps=200, w=0.5, sampling_type="cfdg_ddpm_x0"))
    frames, pitches = model.config.frames, model.config.pitches
    params = model.init(jax.random.key(0))
    wav = jax.numpy.zeros((1, frames * 512))
    x_T = jax.numpy.zeros((1, frames, pitches))

    run = task.sample_jit(donate=False)
    lowered = run.lower(params, x_T, jax.random.key(3), wav)
    module = lowered._lowering.stablehlo()
    compile_options = lowered.compile_args.get("compile_options") or \
        lowered._lowering.compile_args["compile_options"]

    backend = jax.devices()[0].client
    devices = np.array([[jax.devices()[0]]])

    print(f"backend.platform           = {backend.platform}")
    print(f"backend.platform_version   = {backend.platform_version!r}")
    d = jax.devices()[0]
    print(f"device = {d!r}  attrs: "
          f"{ {k: getattr(d, k, None) for k in ('device_kind', 'coords', 'core_on_chip', 'slice_index', 'process_index')} }")

    # per-component running hashes, mirroring jax._src.cache_key.get
    hash_obj = hashlib.sha256()
    components = [
        ("computation", lambda h: cache_key._hash_computation(
            h, module, cache_key.IgnoreCallbacks.NO)),
        ("jaxlib_version", lambda h: h.update(
            cache_key.jaxlib_version_str.encode())),
        ("backend_version", lambda h: cache_key._hash_platform(h, backend)),
        ("xla_flags", lambda h: cache_key._hash_xla_flags(
            h, cache_key.get_flag_prefixes())),
        ("compile_options", lambda h: cache_key._hash_serialized_compile_options(
            h, compile_options, strip_device_assignment=False)),
        ("accelerator_config", lambda h: cache_key._hash_accelerator_config(
            h, devices)),
        ("compression", lambda h: cache_key._hash_string(h, "zstandard")),
        ("custom_hook", lambda h: cache_key._hash_string(
            h, cache_key.custom_hook())),
    ]
    for name, fn in components:
        fn(hash_obj)
        print(f"after {name:20s}: {hash_obj.hexdigest()[:16]}")

    key = cache_key.get(module, devices, compile_options, backend)
    print(f"final cache key: {key}")
    hits = list(pathlib.Path(cache).glob(f"*{key.split('-')[-1]}*"))
    print(f"in cache dir: {bool(hits)} {[h.name for h in hits]}")


if __name__ == "__main__":
    main()
