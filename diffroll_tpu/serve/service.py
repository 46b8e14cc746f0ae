"""The transcription service: model-resident worker + micro-batching
dispatcher + HTTP front (see package docstring for the design)."""

from __future__ import annotations

import json
import math
import queue
import tempfile
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

import jax
import jax.numpy as jnp


@dataclass
class _WindowJob:
    """One fixed-size window awaiting the batched sampler."""

    wav: np.ndarray                  # (seq_len,) f32
    request: "_Request"
    index: int                       # position within the request
    t_enqueue: float = 0.0           # monotonic, for queue-wait stats


@dataclass
class _Request:
    n_windows: int
    total_frames: int
    overlap_frames: int
    rolls: List[Optional[np.ndarray]] = field(default_factory=list)
    done: threading.Event = field(default_factory=threading.Event)
    error: Optional[BaseException] = None
    # set when the caller gave up (timeout) or enqueuing failed midway;
    # the dispatcher drops still-queued windows of abandoned requests so
    # an overloaded backlog drains instead of burning the chip on work
    # nobody is waiting for
    abandoned: bool = False

    @property
    def dead(self) -> bool:
        return self.abandoned or self.done.is_set()

    def deliver(self, index: int, roll: np.ndarray):
        self.rolls[index] = roll
        if all(r is not None for r in self.rolls):
            self.done.set()


class ServiceOverloaded(RuntimeError):
    """Raised when the window queue is full — callers should back off
    (the HTTP front maps this to 503)."""


class TranscriptionService:
    """Window-level micro-batching around one compiled sampler program."""

    def __init__(self, task, params, *, max_batch: int = 8,
                 max_wait_ms: float = 25.0, overlap_frames: int = 32,
                 frame_threshold: float = 0.5, seed: int = 0, mesh=None,
                 max_body_mb: float = 64.0, max_queued_windows: int = 256,
                 transfer_dtype: str = "float32", pipeline_depth: int = 2,
                 detailed_timing: bool = False):
        self.task = task
        self.params = params
        self.mesh = mesh
        mc = task.model.config
        self.frames = mc.frames
        self.hop = mc.mel.hop_length
        self.sample_rate = mc.mel.sample_rate
        self.seq_len = self.frames * self.hop
        self.pitches = mc.pitches
        if mesh is not None:
            data_axis = mesh.shape["data"]
            max_batch = max(max_batch // data_axis, 1) * data_axis
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self.overlap_frames = overlap_frames
        self.frame_threshold = frame_threshold
        self.max_body_bytes = int(max_body_mb * 1024 * 1024)
        # host->device transfer format for the waveform batch — the
        # single largest per-batch transfer (max_batch x seq_len f32 =
        # 10.5 MB at B=8 full size, dominant on a slow host link).
        # "int16" halves it and is bit-faithful to 16-bit PCM sources
        # (the decode path the corpora use); dequantized in-jit.
        if transfer_dtype not in ("float32", "int16"):
            raise ValueError(f"transfer_dtype must be float32|int16, "
                             f"got {transfer_dtype!r}")
        self.transfer_dtype = transfer_dtype
        # how many batches may be in flight at once: depth 2 overlaps
        # host-side assembly + H2D of batch k+1 with device compute of
        # batch k (JAX async dispatch); depth 1 = serial, required by
        # detailed_timing (stage boundaries must not overlap to be
        # attributable)
        self.pipeline_depth = 1 if detailed_timing else max(
            int(pipeline_depth), 1)
        self.detailed_timing = detailed_timing
        # bounded: the only other backpressure is callers parked in
        # done.wait(), and ThreadingHTTPServer spawns a thread per
        # connection — an unbounded queue lets concurrent large requests
        # grow host memory without limit on this single-CPU host
        self._queue: "queue.Queue[_WindowJob]" = queue.Queue(
            maxsize=max(max_queued_windows, max_batch))
        self._key = jax.random.key(seed)
        self._key_lock = threading.Lock()
        # the compiled program takes (params, key, wav) and creates x_T
        # ON DEVICE from the key: shipping host-side gaussian noise costs
        # an extra H2D (B x frames x 88 f32) per batch and host RNG time
        self._run = self._make_run()
        self._stop = threading.Event()
        # completion pipeline: the dispatcher issues batches (async JAX
        # dispatch) and hands (jobs, device result) to the completion
        # thread, which blocks on D2H and delivers. Queue size bounds the
        # number of batches in flight to pipeline_depth (1 draining in the
        # completion thread + maxsize waiting).
        self._completions: "queue.Queue" = queue.Queue(
            maxsize=max(self.pipeline_depth - 1, 1))
        self._worker = threading.Thread(target=self._dispatch_loop,
                                        daemon=True)
        self._completer = threading.Thread(target=self._completion_loop,
                                           daemon=True)
        self.stats = {"requests": 0, "windows": 0, "batches": 0,
                      "audio_seconds": 0.0}
        self._stats_lock = threading.Lock()
        self._worker.start()
        self._completer.start()

    def _make_run(self):
        """The one compiled sampler program: (params, key, wav) -> rolls."""
        task, mesh = self.task, self.mesh
        shape = (self.max_batch, self.frames, self.pitches)

        def run(params, key, wav):
            nk, sk = jax.random.split(key)
            if wav.dtype == jnp.int16:
                wav = wav.astype(jnp.float32) * (1.0 / 32768.0)
            x_T = jax.random.normal(nk, shape)
            if mesh is not None:
                from ..parallel.mesh import batch_sharding

                x_T = jax.lax.with_sharding_constraint(
                    x_T, batch_sharding(mesh))
            x0, _ = task.sample(params, x_T, sk, waveform=wav,
                                record_every=None, mesh=mesh)
            return x0

        return jax.jit(run)

    # ------------------------------------------------------------- warmup

    def warmup(self, timeout: Optional[float] = 1800.0):
        """Compile the sampler program before taking traffic. Uses its own
        generous timeout — the first full-size compile can exceed the
        ordinary request deadline. The synthetic warmup request is
        excluded from the service counters."""
        wav = np.zeros(self.seq_len, np.float32)
        self.transcribe(wav, timeout=timeout)
        with self._stats_lock:
            self.stats.clear()  # incl. warmup's timing sums
            self.stats.update(requests=0, windows=0, batches=0,
                              audio_seconds=0.0)

    # -------------------------------------------------------------- public

    def transcribe(self, audio: np.ndarray,
                   sample_rate: Optional[int] = None,
                   timeout: Optional[float] = 300.0) -> np.ndarray:
        """Waveform of any length -> (n_frames, 88) roll. Thread-safe;
        concurrent calls share sampler batches."""
        from ..tasks.transcribe import split_windows

        audio = np.asarray(audio, np.float32)
        if sample_rate is not None and sample_rate != self.sample_rate:
            from .. import native

            audio = native.resample(audio, sample_rate, self.sample_rate)
        total_frames = max(1, math.ceil(len(audio) / self.hop))
        windows = split_windows(audio, self.seq_len, self.hop,
                                self.overlap_frames)
        req = _Request(n_windows=len(windows), total_frames=total_frames,
                       overlap_frames=self.overlap_frames,
                       rolls=[None] * len(windows))
        for i, wav in enumerate(windows):
            try:
                self._queue.put_nowait(_WindowJob(wav=wav, request=req,
                                                  index=i,
                                                  t_enqueue=time.monotonic()))
            except queue.Full:
                req.abandoned = True  # dispatcher drops the enqueued part
                raise ServiceOverloaded(
                    f"window queue full ({self._queue.maxsize} in flight); "
                    "retry later")
        if not req.done.wait(timeout):
            req.abandoned = True  # stop the dispatcher working a dead request
            raise TimeoutError("transcription timed out")
        if req.error is not None:
            raise req.error
        from ..tasks.transcribe import stitch_rolls

        with self._stats_lock:
            self.stats["requests"] += 1
            self.stats["audio_seconds"] += len(audio) / self.sample_rate
        return stitch_rolls(np.stack(req.rolls), self.overlap_frames,
                            total_frames)

    def notes(self, roll: np.ndarray, threshold: Optional[float] = None):
        """Binarized roll -> [(pitch, onset_s, offset_s)] note events."""
        from ..eval.notes import extract_notes

        thr = self.frame_threshold if threshold is None else threshold
        pitches, intervals = extract_notes(roll, roll, thr, thr)
        scale = self.hop / self.sample_rate
        return [
            {"pitch": int(p) + 21, "onset": round(float(i0) * scale, 4),
             "offset": round(float(i1) * scale, 4)}
            for p, (i0, i1) in zip(pitches, intervals)
        ]

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)
        self._completer.join(timeout=5)

    # ---------------------------------------------------------- dispatcher

    def _dispatch_loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            if first.request.dead:
                continue
            jobs = [first]
            deadline = time.monotonic() + self.max_wait_s
            while len(jobs) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    job = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if not job.request.dead:
                    jobs.append(job)
            # re-check: a caller may have timed out while the batch filled
            jobs = [j for j in jobs if not j.request.dead]
            if not jobs:
                continue
            try:
                self._issue_batch(jobs)
            except BaseException as e:  # surface to every waiting request
                for job in jobs:
                    job.request.error = e
                    job.request.done.set()

    def _issue_batch(self, jobs: List[_WindowJob]):
        """Assemble + dispatch one batch; completion happens in the
        completion thread (JAX dispatch is async, so the device computes
        batch k while this thread assembles and transfers batch k+1 —
        the two-deep pipeline that hides host work behind compute)."""
        t0 = time.monotonic()
        queue_wait = sum(t0 - j.t_enqueue for j in jobs) / len(jobs)
        wav = np.zeros((self.max_batch, self.seq_len), np.float32)
        for i, job in enumerate(jobs):
            wav[i] = job.wav
        if self.transfer_dtype == "int16":
            wav = (np.clip(wav, -1.0, 1.0) * 32767.0).astype(np.int16)
        with self._key_lock:
            self._key, k = jax.random.split(self._key)
        t1 = time.monotonic()
        timing = {"queue_wait_s": queue_wait, "assemble_s": t1 - t0}
        if self.detailed_timing:
            # serialize the stages so each is attributable: H2D alone...
            wav_j = jax.block_until_ready(jnp.asarray(wav))
            t2 = time.monotonic()
            timing["h2d_s"] = t2 - t1
            # ...then device compute alone (includes the in-jit x_T draw)
            rolls_dev = jax.block_until_ready(
                self._run(self.params, k, wav_j))
            timing["compute_s"] = time.monotonic() - t2
        else:
            rolls_dev = self._run(self.params, k, jnp.asarray(wav))
        timing["t_issue"] = t1
        # blocks when pipeline_depth batches are already in flight —
        # that backpressure is the pipeline depth limit
        self._completions.put((jobs, rolls_dev, timing))

    def _completion_loop(self):
        while not self._stop.is_set():
            try:
                jobs, rolls_dev, timing = self._completions.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                t0 = time.monotonic()
                rolls = np.asarray(rolls_dev)  # awaits compute + D2H
                t1 = time.monotonic()
                with self._stats_lock:
                    self.stats["windows"] += len(jobs)
                    self.stats["batches"] += 1
                    s = self.stats
                    s["sum_queue_wait_s"] = (s.get("sum_queue_wait_s", 0.0)
                                             + timing["queue_wait_s"])
                    s["sum_assemble_s"] = (s.get("sum_assemble_s", 0.0)
                                           + timing["assemble_s"])
                    if self.detailed_timing:
                        s["sum_h2d_s"] = (s.get("sum_h2d_s", 0.0)
                                          + timing["h2d_s"])
                        s["sum_compute_s"] = (s.get("sum_compute_s", 0.0)
                                              + timing["compute_s"])
                        s["sum_d2h_s"] = s.get("sum_d2h_s", 0.0) + (t1 - t0)
                    else:
                        # issue -> ready: compute + transfers, overlapped
                        s["sum_batch_wall_s"] = (
                            s.get("sum_batch_wall_s", 0.0)
                            + (t1 - timing["t_issue"]))
            except BaseException as e:  # surface to every waiting request
                for job in jobs:
                    job.request.error = e
                    job.request.done.set()
                continue
            for i, job in enumerate(jobs):
                job.request.deliver(job.index, rolls[i])


# ------------------------------------------------------------------- HTTP

def _make_handler(service: TranscriptionService, info: dict):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code, body: bytes, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                with service._stats_lock:
                    stats = dict(service.stats)
                payload = {"status": "ok", "stats": stats, **info}
                self._send(200, json.dumps(payload).encode())
            else:
                self._send(404, b'{"error": "not found"}')

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/transcribe":
                self._send(404, b'{"error": "not found"}')
                return
            q = parse_qs(url.query)
            length = int(self.headers.get("Content-Length", 0))
            if length > service.max_body_bytes:
                self._send(413, json.dumps(
                    {"error": f"body exceeds {service.max_body_bytes} bytes"}
                ).encode())
                return
            body = self.rfile.read(length)
            # client-side faults (undecodable audio, bad query params) -> 400
            try:
                from ..io.wav import read_wav_bytes

                thr = float(q.get("threshold", [service.frame_threshold])[0])
                audio, sr = read_wav_bytes(body, mono=True)
            except Exception as e:
                self._send(400, json.dumps({"error": str(e)}).encode())
                return
            # server-side faults (sampler/runtime errors, queue timeout)
            # -> 5xx, so retry policies and monitoring classify correctly
            try:
                t0 = time.monotonic()
                roll = service.transcribe(audio, sample_rate=sr)
                notes = service.notes(roll, thr)
                if q.get("midi", ["0"])[0] in ("1", "true"):
                    from ..io.midi import write_midi

                    with tempfile.NamedTemporaryFile(suffix=".mid") as tmp:
                        write_midi(tmp.name,
                                   [n["pitch"] for n in notes],
                                   [(n["onset"], n["offset"]) for n in notes])
                        tmp.seek(0)
                        self._send(200, tmp.read(), ctype="audio/midi")
                    return
                payload = {
                    "frames": int(roll.shape[0]),
                    "audio_seconds": round(len(audio) / sr, 3),
                    "latency_s": round(time.monotonic() - t0, 4),
                    "notes": notes,
                }
                self._send(200, json.dumps(payload).encode())
            except ServiceOverloaded as e:
                self.send_response(503)
                self.send_header("Retry-After", "1")
                body = json.dumps({"error": str(e)}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except TimeoutError as e:
                self._send(504, json.dumps({"error": str(e)}).encode())
            except Exception as e:  # must not kill the server
                self._send(500, json.dumps({"error": str(e)}).encode())

    return Handler


def serve_forever(service: TranscriptionService, host: str = "127.0.0.1",
                  port: int = 8077, info: Optional[dict] = None,
                  ready: Optional[threading.Event] = None):
    """Blocking HTTP loop. When `ready` is given, the ThreadingHTTPServer
    instance is attached as `ready.server` before `ready.set()`, so a
    caller running this in a thread can `ready.wait()` then drive
    `ready.server.shutdown()` (this function itself only returns after
    shutdown; see tests/test_serve.py)."""
    server = ThreadingHTTPServer((host, port),
                                 _make_handler(service, info or {}))
    if ready is not None:
        ready.server = server  # type: ignore[attr-defined]
        ready.set()
    server.serve_forever()
