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
  * train_mfu_{bf16,f32}_step_vs_bf16_peak — XLA-counted step FLOPs /
                                  (that step's time x 197e12, the v5e
                                  bf16 peak), labeled by step dtype
  * e2e_scan_latency_s / megakernel_active — the scan path measured with
                                  the megakernel forced off, plus whether
                                  the headline actually used the kernel
  * b1_split_*                  — B=1 bottleneck split by sampler surgery
                                  (CFG vs single-stream vs deterministic)
  * serve_{dense,distilled5}_{p50_s,p99_s,audio_s_per_s} — in-process
                                  TranscriptionService under concurrent
                                  synthetic load (saturation soak)
  * host_pipeline_clips_per_sec — DataLoader throughput over an on-disk
                                  synthetic MAPS tree (decode+rasterize),
                                  to compare against train_clips_per_sec
"""

from __future__ import annotations

import atexit
import json
import os
import pathlib
import signal
import sys
import tempfile
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

BF16_PEAK_FLOPS = 197e12  # v5e per-chip bf16 peak

# ---------------------------------------------------------------------------
# Outage-proof harness (BENCH_r03 post-mortem): the TPU tunnel can (a) fail
# backend init fast, (b) hang jax.devices()/dispatch indefinitely. r3 hit
# both — the sampling section failed fast, the train section hung in backend
# re-init, and the driver's `timeout` killed the process (rc 124) BEFORE the
# single JSON line printed, losing the whole round's perf evidence. Rules:
#   1. Preflight the backend in a SUBPROCESS with a hard timeout; a dead
#      tunnel degrades to an immediate parseable JSON line, exit 0.
#   2. Every section runs under a SIGALRM wall-clock budget; a mid-run hang
#      becomes a `{section}_error: "timeout"` field, not a lost round.
#   3. The JSON line is emitted exactly once from whichever of these fires
#      first: normal completion, SIGTERM/SIGINT (the driver's `timeout`
#      sends SIGTERM before SIGKILL), a global watchdog thread, or atexit.
# Tunable: BENCH_GLOBAL_BUDGET_S (default 1320), BENCH_SKIP_PREFLIGHT=1.
# ---------------------------------------------------------------------------

_STATE = {"emitted": False, "dt": None, "extras": {}}
_EMIT_LOCK = threading.Lock()


def _emit_json_line() -> None:
    """Print the single driver-parsed JSON line, exactly once.

    The headline value is DERIVED FROM EXTRAS, never only from a section's
    return value: r4 measured the headline (ddpm_steps_per_sec proved it)
    and then lost it because a later sub-measurement timed out and the
    section's return value was the only carrier. Fallback ladder:
    e2e_latency_s (written the instant it exists) -> 200/steps_per_sec ->
    the scan-path latency (flagged as a degraded headline)."""
    with _EMIT_LOCK:
        if _STATE["emitted"]:
            return
        _STATE["emitted"] = True
    extras = _STATE["extras"]
    dt = _STATE["dt"] or extras.get("e2e_latency_s")
    if dt is None and extras.get("ddpm_steps_per_sec"):
        dt = 200.0 / extras["ddpm_steps_per_sec"]
        extras["headline_source"] = "derived_from_steps_per_sec"
    if dt is None and extras.get("e2e_scan_latency_s"):
        dt = extras["e2e_scan_latency_s"]
        extras["headline_source"] = "scan_path_fallback"
    budget_s = 1.0  # north-star: < 1 s per 20.48 s clip (BASELINE.md:32)
    print(json.dumps({
        "metric": "e2e_transcription_latency_20s_clip",
        "value": round(dt, 4) if dt else None,
        "unit": "s",
        "vs_baseline": round(budget_s / dt, 3) if dt else None,
        "extras": extras,
    }), flush=True)


def _term_handler(signum, frame):
    _STATE["extras"]["killed_by_signal"] = int(signum)
    _emit_json_line()
    os._exit(0)


class SectionCtx:
    """Cooperative wall-clock budget handed to each section.

    Sections call `has(need_s, skip_key, extras)` BEFORE each expensive
    sub-measurement: if less than `need_s` remains (or the section was
    abandoned by the harness), the sub-measurement is skipped and recorded
    as such instead of overrunning the budget. This keeps an abandoned
    daemon thread from continuing to dispatch to the chip underneath the
    next section (r4: the timed-out sampling thread kept compiling b16
    programs while the train section measured — contention the train
    numbers absorbed silently)."""

    def __init__(self, deadline: float):
        self.deadline = deadline
        self.cancel = threading.Event()

    def remaining(self) -> float:
        return self.deadline - time.perf_counter()

    def has(self, need_s: float, skip_key: str | None = None,
            extras: dict | None = None) -> bool:
        if self.cancel.is_set():
            ok = False
            why = "section abandoned"
        else:
            ok = self.remaining() > need_s
            why = f"budget: {self.remaining():.0f}s left < {need_s:.0f}s est"
        if not ok and skip_key is not None and extras is not None:
            extras[skip_key] = f"skipped ({why})"
        return ok


def run_section(name: str, fn, extras: dict, budget_s: float) -> object:
    """Run one bench section in a daemon WORKER thread under a wall-clock
    budget; failures and timeouts degrade to `{name}_error` fields.

    Why a thread and not SIGALRM: the observed tunnel hang sits inside a C
    call (backend init / grpc wait) in whichever thread runs it — a Python
    signal handler only executes when the MAIN thread next runs bytecode,
    so an in-main-thread hang makes SIGALRM *and* the driver's SIGTERM
    silently undeliverable (verified live against a dead tunnel). With the
    section in a worker thread, the main thread sits in an interruptible
    join loop: budgets expire on time, SIGTERM flushes the JSON line, and
    a hung section is abandoned (daemon) rather than wedging the process."""
    t0 = time.perf_counter()
    ctx = SectionCtx(t0 + budget_s)
    result = {}

    def _target():
        try:
            result["out"] = fn(extras, ctx)
        except BaseException as e:  # noqa: BLE001 - a bench section must not kill the run
            result["err"] = f"{type(e).__name__}: {e}"[:300]

    worker = threading.Thread(target=_target, name=f"bench-{name}",
                              daemon=True)
    worker.start()
    while worker.is_alive() and time.perf_counter() < ctx.deadline:
        worker.join(timeout=1.0)
    if worker.is_alive():
        ctx.cancel.set()  # stop it before its NEXT sub-measurement
        extras[f"{name}_error"] = f"timeout after {budget_s:.0f}s"
        print(f"[bench] {name} TIMED OUT ({budget_s:.0f}s) — abandoning",
              file=sys.stderr)
        return None
    if "err" in result:
        extras[f"{name}_error"] = result["err"]
        print(f"[bench] {name} FAILED: {result['err']}", file=sys.stderr)
        return None
    print(f"[bench] {name} done in {time.perf_counter()-t0:.0f}s: "
          f"{extras}", file=sys.stderr)
    return result.get("out")


def timeit(fn, iters: int = 5, warmup: int = 1) -> float:
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / iters


def bench_sampling(extras, ctx):
    from diffroll_tpu import models
    from diffroll_tpu.tasks import DiffusionTask, TaskConfig

    model = models.build("ClassifierFreeDiffRoll")
    frames, pitches = model.config.frames, model.config.pitches

    def make_task(steps, sampling_type=None, w=0.5, megakernel=None):
        if sampling_type is None:
            sampling_type = "cfdg_ddpm_x0" if steps is None else "cfdg_ddim_x0"
        return DiffusionTask(model, TaskConfig(
            timesteps=200, w=w, sampling_type=sampling_type,
            sampling_steps=steps, use_megakernel=megakernel))

    params = model.init(jax.random.key(0))

    def e2e(batch, steps, sampling_type=None, w=0.5, megakernel=None):
        task = make_task(steps, sampling_type, w, megakernel)
        wav = jax.random.normal(jax.random.key(1), (batch, frames * 512))
        x_T = jax.random.normal(jax.random.key(2), (batch, frames, pitches))
        run = task.sample_jit(donate=False)
        return timeit(lambda: run(params, x_T, jax.random.key(3), wav))

    # the headline auto-selects the megakernel; record that it actually
    # did (a silently-failed supports_fused gate would otherwise hide a
    # fallback to the scan path in this very number)
    extras["megakernel_active"] = bool(make_task(None)._megakernel_applies())
    t0 = time.perf_counter()
    dt = e2e(1, None)                       # headline: 200-step CFG DDPM
    first_cost = time.perf_counter() - t0   # compile (if cold) + runs
    # write the headline THE INSTANT it exists (r4 post-mortem: the number
    # was measured, then discarded when a later sub-measurement timed out)
    extras["e2e_latency_s"] = round(dt, 4)
    extras["ddpm_steps_per_sec"] = round(200.0 / dt, 1)
    _STATE["dt"] = dt
    extras["sampling_headline_wall_s"] = round(first_cost, 1)

    # every remaining sub-measurement is a comparable full-size program:
    # under a cold cache each costs roughly what the headline cost, so
    # gate each on an estimate derived from the headline's observed wall
    need = max(60.0, 1.15 * first_cost)

    # priority order: B=16 serving throughput (2nd headline number), then
    # the fast-sampling numbers, then the scan-path regression tracker,
    # then the distilled path, then the 3-compile b1 bottleneck split
    if ctx.has(need, "serving_b16", extras):
        dt16 = e2e(16, None)
        extras["serving_audio_s_per_s_b16"] = round(
            16 * frames * 512 / 16000 / dt16, 1)
    if ctx.has(need, "ddim50", extras):
        extras["ddim50_latency_s"] = round(e2e(1, 50), 4)
    # scan path measured alongside (megakernel force-off) so a regression
    # in EITHER path is visible in the same bench line
    if ctx.has(need, "e2e_scan", extras):
        extras["e2e_scan_latency_s"] = round(e2e(1, None, megakernel=False), 4)

    # the distilled-sampler serving path (train/distill.py): few-step
    # deterministic grid, guidance folded in => ONE forward per step.
    # Latency is weight-independent, so random params measure it exactly;
    # quality evidence lives in examples/synthetic_end_to_end.py distill=1.
    if ctx.has(need, "distilled5", extras):
        extras["distilled5_latency_s"] = round(
            e2e(1, 5, sampling_type="ddim_x0", w=0.0), 4)
    if ctx.has(need, "distilled5_b16", extras):
        d16 = e2e(16, 5, sampling_type="ddim_x0", w=0.0)
        extras["distilled5_audio_s_per_s_b16"] = round(
            16 * frames * 512 / 16000 / d16, 1)

    # B=1 bottleneck split by sampler-family surgery at the same 200-step
    # grid: full CFG (2 denoiser streams + noise) vs single-stream DDPM
    # (1 stream + noise) vs deterministic DDIM (1 stream, megakernel skips
    # the noise stream entirely) — the deltas localize the guidance branch
    # and the noise generation/streaming cost
    if ctx.has(2 * need, "b1_split", extras):
        b1_uncond = e2e(1, 200, sampling_type="ddpm_x0", w=0.0)
        b1_det = e2e(1, 200, sampling_type="ddim_x0", w=0.0)
        extras["b1_split_cfg_200step_s"] = round(dt, 4)
        extras["b1_split_single_stream_200step_s"] = round(b1_uncond, 4)
        extras["b1_split_deterministic_200step_s"] = round(b1_det, 4)
        extras["b1_split_guidance_cost_s"] = round(dt - b1_uncond, 4)
        extras["b1_split_noise_cost_s"] = round(b1_uncond - b1_det, 4)
    return dt


def bench_train(extras, ctx):
    import optax

    from diffroll_tpu import models
    from diffroll_tpu.tasks import DiffusionTask, TaskConfig
    from diffroll_tpu.train import TrainState, make_optimizer

    B, K = 16, 20

    def step_time(dtype, fused_train=None):
        from diffroll_tpu.train.state import AdamTx, fused_adam_apply

        model = models.build("ClassifierFreeDiffRoll", dtype=dtype)
        task = DiffusionTask(model, TaskConfig(timesteps=200,
                                               fused_train=fused_train))
        params = model.init(jax.random.key(0))
        tx = make_optimizer(5e-5)
        state = TrainState.create(params, tx)
        frames = model.config.frames
        # a DISTINCT batch per scan step, streamed through scan xs: with a
        # single closed-over batch XLA hoists the loop-invariant mel
        # front-end (and q_sample inputs) out of the scan, understating
        # the real step cost by the full per-step mel (~10 ms on the FFT
        # path) — real training feeds a fresh batch every step
        batches = {
            "frame": (jax.random.uniform(jax.random.key(1),
                                         (K, B, frames, 88))
                      > 0.9).astype(jnp.float32),
            "audio": jax.random.normal(jax.random.key(2),
                                       (K, B, frames * 512)),
        }

        def inner(state, xs):
            batch, key = xs
            (_, (losses, _)), grads = jax.value_and_grad(
                lambda p: task.loss_fn(p, batch, key, True), has_aux=True
            )(state.params)
            if isinstance(tx, AdamTx):
                new_p, opt = fused_adam_apply(tx, state.params, grads,
                                              state.opt_state)
            else:
                updates, opt = tx.update(grads, state.opt_state, state.params)
                new_p = optax.apply_updates(state.params, updates)
            return TrainState(step=state.step + 1, params=new_p,
                              opt_state=opt), losses["diffusion_loss"]

        # K chained steps inside ONE dispatch: amortizes the tunnel RTT.
        # batches MUST be a jit argument, not a closure capture — captured
        # arrays serialize into the remote-compile request, and 420 MB of
        # batch data overflows the compile service's body limit (HTTP 413
        # / dropped connections)
        @jax.jit
        def many(state, key, batches):
            return jax.lax.scan(inner, state,
                                (batches, jax.random.split(key, K)))

        dt = timeit(lambda: many(state, jax.random.key(3), batches),
                    iters=3) / K

        flops = None
        try:
            one = {k: v[0] for k, v in batches.items()}
            cost = jax.jit(inner).lower(
                state, (one, jax.random.key(0))).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0)) or None
        except Exception:
            pass
        return dt, flops

    # default path (per-layer flax stack through XLA autodiff).
    # Key naming (r4, ADVICE): steps and clips/sec are dtype-labeled;
    # `train_step_ms_b16` keeps its r2 semantics (the f32 step) so
    # cross-round trends stay apples-to-apples. bf16 (the recommended
    # training dtype) measures FIRST so a budget squeeze sheds the
    # secondary dtypes, not the headline trend number.
    t0 = time.perf_counter()
    dt16, flops16 = step_time("bfloat16")
    first_cost = time.perf_counter() - t0
    extras["train_step_bf16_ms_b16"] = round(dt16 * 1e3, 2)
    extras["train_clips_per_sec_bf16"] = round(B / dt16, 1)
    # MFU labeled by the dtype of the step being divided (r2 mixed an f32
    # step time with the bf16 peak): each is XLA-counted step FLOPs over
    # (that step's time x the 197 TFLOP/s v5e bf16 peak)
    if flops16:
        extras["train_mfu_bf16_step_vs_bf16_peak"] = round(
            flops16 / (dt16 * BF16_PEAK_FLOPS), 3)
    need = max(60.0, 1.15 * first_cost)
    if ctx.has(need, "train_f32", extras):
        dt32, flops32 = step_time("float32")
        extras["train_step_ms_b16"] = round(dt32 * 1e3, 2)  # legacy alias (f32)
        extras["train_step_f32_ms_b16"] = round(dt32 * 1e3, 2)
        extras["train_clips_per_sec_f32"] = round(B / dt32, 1)
        if flops32:
            extras["train_mfu_f32_step_vs_bf16_peak"] = round(
                flops32 / (dt32 * BF16_PEAK_FLOPS), 3)
    # the opt-in custom-VJP fused stack (task.fused_train=true), tracked so
    # regressions/improvements in the training kernels stay visible
    if ctx.has(need, "train_fused", extras):
        dt_fused, _ = step_time("float32", fused_train=True)
        extras["train_step_fused_ms_b16"] = round(dt_fused * 1e3, 2)


def bench_serve(extras, ctx):
    """Driver-captured serving metrics (moves the soak claims out of
    README prose): the in-process TranscriptionService under concurrent
    synthetic load, for the dense CFG sampler and the distilled few-step
    path. Emits p50/p99 request latency and audio-seconds-per-second at
    saturation. Runs inside this one bench process — the single-user TPU
    constraint (only one job may touch the chip) is respected."""
    import threading

    from diffroll_tpu import models
    from diffroll_tpu.serve import TranscriptionService
    from diffroll_tpu.tasks import DiffusionTask, TaskConfig

    model = models.build("ClassifierFreeDiffRoll")
    params = model.init(jax.random.key(0))
    seq = model.config.frames * model.config.mel.hop_length
    rng = np.random.RandomState(0)
    clip = rng.randn(seq).astype(np.float32) * 0.1

    def soak(tag, task, n_requests, n_threads, max_batch):
        # the shipped serving config (ServeConfig defaults): depth-2
        # pipeline + int16 waveform transfer — the r5 decomposition
        # (results/serve_profile_r5/) measured p50 2.94 s serialized ->
        # 1.53 s with these, the residual being tunnel H2D/D2H bandwidth
        svc = TranscriptionService(task, params, max_batch=max_batch,
                                   max_wait_ms=25.0, overlap_frames=32,
                                   transfer_dtype="int16")
        svc.warmup()
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
        svc.close()
        lat = np.sort(latencies)
        extras[f"serve_{tag}_p50_s"] = round(float(np.percentile(lat, 50)), 3)
        extras[f"serve_{tag}_p99_s"] = round(float(np.percentile(lat, 99)), 3)
        extras[f"serve_{tag}_audio_s_per_s"] = round(
            n_requests * seq / 16000 / wall, 1)

    dense = DiffusionTask(model, TaskConfig(
        timesteps=200, w=0.5, sampling_type="cfdg_ddpm_x0"))
    soak("dense", dense, n_requests=32, n_threads=16, max_batch=8)
    if ctx.has(120.0, "serve_distilled5", extras):
        distilled = DiffusionTask(model, TaskConfig(
            timesteps=200, w=0.0, sampling_type="ddim_x0", sampling_steps=5))
        soak("distilled5", distilled, n_requests=128, n_threads=16,
             max_batch=16)


def bench_host_pipeline(extras, ctx):
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
        rates = [one_epoch()
                 for _ in range(4) if ctx.has(15.0, "host_steady", extras)]
        if rates:
            extras["host_pipeline_clips_per_sec"] = round(
                float(np.median(rates)), 1)


def main():
    extras = _STATE["extras"]
    atexit.register(_emit_json_line)
    signal.signal(signal.SIGTERM, _term_handler)
    signal.signal(signal.SIGINT, _term_handler)

    # global watchdog: if anything wedges past the overall budget (the
    # driver's own timeout is longer but finite), flush the line and die
    # cleanly rather than rc-124 with nothing on stdout. Default sized to
    # the driver's OBSERVED kill window: r4 got SIGTERMed ~1500 s in with
    # the old 2400 s default, losing the serve/host sections entirely.
    global_budget = float(os.environ.get("BENCH_GLOBAL_BUDGET_S", "1320"))
    t_start = time.perf_counter()

    def _watchdog():
        extras["global_timeout"] = True
        print(f"[bench] GLOBAL BUDGET ({global_budget:.0f}s) exceeded — "
              f"flushing partial results", file=sys.stderr)
        _emit_json_line()
        os._exit(0)

    wd = threading.Timer(global_budget, _watchdog)
    wd.daemon = True
    wd.start()

    # preflight: the target backend must come up in a SUBPROCESS within a
    # hard timeout (in-process jax.devices() can hang forever on a dead
    # tunnel). Skipped when the run is pinned to CPU.
    platform = os.environ.get("JAX_PLATFORMS", "axon") or "cpu"
    extras["platform"] = platform
    if platform != "cpu" and os.environ.get("BENCH_SKIP_PREFLIGHT") != "1":
        sys.path.insert(0, str(pathlib.Path(__file__).parent / "tools"))
        from wait_tpu import probe_tpu
        t0 = time.perf_counter()
        up = probe_tpu(timeout=float(
            os.environ.get("BENCH_PREFLIGHT_TIMEOUT_S", "90")))
        print(f"[bench] preflight: backend "
              f"{'UP' if up else 'UNAVAILABLE'} "
              f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr)
        if not up:
            extras["backend_unavailable"] = True
            _emit_json_line()
            return

    # persistent XLA cache: full-size programs compile in minutes over the
    # device tunnel; warm reruns reload in seconds. The helper also drops
    # the remote server's volatile build line from the cache key — without
    # that, every backend redeploy rotated every key and the headline
    # recompiled cold (~800 s) hours after being primed (r5 finding).
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from diffroll_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()

    # sections are independent; a transient tunnel failure in one (the
    # remote compile service has dropped connections mid-run) must not
    # lose the others' results — progress also streams to stderr. Each
    # section gets a wall-clock budget, clipped to the time remaining
    # under the global budget (60 s reserve for the flush).
    only = os.environ.get("BENCH_SECTIONS")
    # budgets assume a warm persistent cache; a cold cache (fresh VM) needs
    # BENCH_SECTION_SCALE>1 (compiles alone run 5-13 min per full-size
    # program over the tunnel)
    scale = float(os.environ.get("BENCH_SECTION_SCALE", "1"))
    # sampling gets 840 s: a COLD headline compile costs ~805 s wall over
    # the tunnel (r5 prime run) — it must complete INSIDE the section so
    # the harness neither abandons it (losing the value if the process
    # dies early) nor lets its still-compiling thread contend with train
    sections = (("sampling", bench_sampling, 840.0 * scale),
                ("train", bench_train, 320.0 * scale),
                ("serve", bench_serve, 200.0 * scale),
                ("host_pipeline", bench_host_pipeline, 120.0))
    for name, fn, budget in sections:
        if only and name not in only.split(","):
            continue
        remaining = global_budget - (time.perf_counter() - t_start) - 60.0
        if remaining <= 0:
            extras[f"{name}_error"] = "skipped: global budget exhausted"
            continue
        out = run_section(name, fn, extras, min(budget, remaining))
        if name == "sampling" and out is not None:
            _STATE["dt"] = out

    _emit_json_line()


if __name__ == "__main__":
    main()
