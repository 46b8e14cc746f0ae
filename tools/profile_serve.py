"""Serve tail-latency decomposition (VERDICT r4 item 4).

r4 measured dense-soak p50 2.23 s against ~1.6 s of device compute and
could not say where the other ~0.6 s went. This tool runs the same
in-process dense soak as bench.py's serve section, twice:

  1. detailed_timing=True, pipeline_depth=1 — every batch's stages are
     serialized and attributed: queue wait, host assembly, H2D transfer,
     device compute, D2H; per-batch means are printed.
  2. production config (pipeline_depth=2, optionally transfer_dtype=int16)
     — p50/p99/throughput under the overlap pipeline, to show how much of
     the serial-stage cost the pipeline hides.

    python tools/profile_serve.py [platform=axon] [batch=8] [requests=32]
        [threads=16] [transfer=int16] [out=PROFILE_serve.json]
"""

from __future__ import annotations

import json
import pathlib
import sys
import threading
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

ARGS = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)


def soak(svc, clip, n_requests, n_threads):
    latencies = []
    lock = threading.Lock()
    it = iter(range(n_requests))

    def worker():
        while True:
            with lock:
                if next(it, None) is None:
                    return
            t0 = time.perf_counter()
            svc.transcribe(clip)
            dt = time.perf_counter() - t0
            with lock:
                latencies.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat = np.sort(latencies)
    return {
        "p50_s": round(float(np.percentile(lat, 50)), 3),
        "p99_s": round(float(np.percentile(lat, 99)), 3),
        "wall_s": round(wall, 2),
        "throughput_rps": round(n_requests / wall, 2),
    }


def stage_means(stats):
    n = max(stats.get("batches", 0), 1)
    return {k.replace("sum_", "mean_"): round(v / n, 4)
            for k, v in stats.items() if k.startswith("sum_")}


def main():
    import os

    platform = ARGS.get("platform", os.environ.get("JAX_PLATFORMS", "axon"))
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from diffroll_tpu import models
    from diffroll_tpu.serve import TranscriptionService
    from diffroll_tpu.tasks import DiffusionTask, TaskConfig

    from diffroll_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()

    max_batch = int(ARGS.get("batch", "8"))
    n_requests = int(ARGS.get("requests", "32"))
    n_threads = int(ARGS.get("threads", "16"))
    transfer = ARGS.get("transfer", "int16")

    model = models.build("ClassifierFreeDiffRoll")
    params = model.init(jax.random.key(0))
    task = DiffusionTask(model, TaskConfig(
        timesteps=200, w=0.5, sampling_type="cfdg_ddpm_x0"))
    seq = model.config.frames * model.config.mel.hop_length
    rng = np.random.RandomState(0)
    clip = rng.randn(seq).astype(np.float32) * 0.1

    record = {"device": str(jax.devices()[0]), "max_batch": max_batch,
              "n_requests": n_requests, "n_threads": n_threads}

    # -- phase 1: serialized stages, attributable ------------------------
    svc = TranscriptionService(task, params, max_batch=max_batch,
                               max_wait_ms=25.0, overlap_frames=32,
                               detailed_timing=True)
    svc.warmup()
    res = soak(svc, clip, n_requests, n_threads)
    stages = stage_means(svc.stats)
    svc.close()
    record["serial_detailed"] = {**res, **stages}
    print(f"[serial f32] {res} stages={stages}", file=sys.stderr, flush=True)

    # -- phase 2: production pipeline, f32 transfer ----------------------
    svc = TranscriptionService(task, params, max_batch=max_batch,
                               max_wait_ms=25.0, overlap_frames=32,
                               pipeline_depth=2)
    svc.warmup()
    res = soak(svc, clip, n_requests, n_threads)
    record["pipelined_f32"] = {**res, **stage_means(svc.stats)}
    svc.close()
    print(f"[pipelined f32] {record['pipelined_f32']}", file=sys.stderr,
          flush=True)

    # -- phase 3: production pipeline + int16 waveform transfer ----------
    if transfer == "int16":
        svc = TranscriptionService(task, params, max_batch=max_batch,
                                   max_wait_ms=25.0, overlap_frames=32,
                                   pipeline_depth=2, transfer_dtype="int16")
        svc.warmup()
        res = soak(svc, clip, n_requests, n_threads)
        record["pipelined_int16"] = {**res, **stage_means(svc.stats)}
        svc.close()
        print(f"[pipelined int16] {record['pipelined_int16']}",
              file=sys.stderr, flush=True)

    out = ARGS.get("out")
    if out:
        pathlib.Path(out).write_text(json.dumps(record, indent=2) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
