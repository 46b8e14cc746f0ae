"""Serving tier tests: micro-batching service semantics and the HTTP
front end, on a tiny model (untrained nets output the empty-roll prior —
the service plumbing, batching, stitching and decoding are what's under
test)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax

from diffroll_tpu import models
from diffroll_tpu.io.wav import write_wav
from diffroll_tpu.serve import (ServiceOverloaded, TranscriptionService,
                                serve_forever)
from diffroll_tpu.serve.service import _make_handler
from diffroll_tpu.tasks import DiffusionTask, TaskConfig

FRAMES, HOP, SR = 32, 512, 16000
SEQ = FRAMES * HOP


@pytest.fixture(scope="module")
def service():
    model = models.build("ClassifierFreeDiffRoll", residual_channels=16,
                         residual_layers=2, frames=FRAMES, timesteps=6)
    params = model.init(jax.random.key(0))
    task = DiffusionTask(model, TaskConfig(timesteps=6, w=0.5))
    svc = TranscriptionService(task, params, max_batch=4, max_wait_ms=30,
                               overlap_frames=4)
    svc.warmup()
    yield svc
    svc.close()


def test_transcribe_shapes_and_stitching(service):
    # 2.5 windows of audio -> stitched roll covers ceil(len/hop) frames
    n = int(SEQ * 2.5)
    roll = service.transcribe(np.zeros(n, np.float32))
    assert roll.shape == (-(-n // HOP), 88)
    assert np.isfinite(roll).all()


def test_transcribe_resamples_other_rates(service):
    n8k = SEQ // 2  # 8 kHz audio half as many samples for same duration
    roll = service.transcribe(np.zeros(n8k, np.float32), sample_rate=8000)
    assert roll.shape[0] == FRAMES


def test_concurrent_requests_share_batches(service):
    start_batches = service.stats["batches"]
    results = {}

    def run(name, n_windows):
        results[name] = service.transcribe(
            np.zeros(SEQ * n_windows, np.float32))

    threads = [threading.Thread(target=run, args=(f"r{i}", 2))
               for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r.shape[1] == 88 for r in results.values())
    # 3 requests x >=2 windows = >=6 window jobs; with max_batch=4 and a
    # 30 ms gather window they must pack into fewer batches than jobs
    batches = service.stats["batches"] - start_batches
    assert batches < 6, batches


def test_http_endpoints(service, tmp_path):
    ready = threading.Event()
    t = threading.Thread(
        target=serve_forever,
        args=(service, "127.0.0.1", 0),
        kwargs={"info": {"model": "tiny"}, "ready": ready},
        daemon=True,
    )
    t.start()
    assert ready.wait(10)
    server = ready.server  # type: ignore[attr-defined]
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["model"] == "tiny"

        wav_path = tmp_path / "req.wav"
        write_wav(wav_path, np.zeros(SEQ + HOP, np.float32), SR)
        req = urllib.request.Request(
            f"{base}/transcribe", data=wav_path.read_bytes(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            payload = json.loads(r.read())
        assert payload["frames"] == FRAMES + 1
        assert isinstance(payload["notes"], list)

        # MIDI variant returns a standard MIDI header
        req = urllib.request.Request(
            f"{base}/transcribe?midi=1", data=wav_path.read_bytes(),
            method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            midi = r.read()
        assert midi[:4] == b"MThd"

        # malformed body -> 400, server stays alive
        req = urllib.request.Request(
            f"{base}/transcribe", data=b"not a wav", method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"
    finally:
        server.shutdown()


def test_warmup_excluded_from_stats():
    model = models.build("ClassifierFreeDiffRoll", residual_channels=16,
                         residual_layers=2, frames=FRAMES, timesteps=4)
    params = model.init(jax.random.key(0))
    task = DiffusionTask(model, TaskConfig(timesteps=4, w=0.5))
    svc = TranscriptionService(task, params, max_batch=2, max_wait_ms=5,
                               overlap_frames=4)
    svc.warmup()
    assert svc.stats == {"requests": 0, "windows": 0, "batches": 0,
                         "audio_seconds": 0.0}
    svc.transcribe(np.zeros(SEQ, np.float32))
    assert svc.stats["requests"] == 1 and svc.stats["windows"] == 1
    svc.close()


def test_overload_backpressure_and_abandoned_requests():
    """A full window queue rejects with ServiceOverloaded, and windows of
    dead requests (timed-out or rejected mid-enqueue) are dropped by the
    dispatcher instead of burning sampler time."""
    model = models.build("ClassifierFreeDiffRoll", residual_channels=16,
                         residual_layers=2, frames=FRAMES, timesteps=4)
    params = model.init(jax.random.key(0))
    task = DiffusionTask(model, TaskConfig(timesteps=4, w=0.5))
    svc = TranscriptionService(task, params, max_batch=2, max_wait_ms=5,
                               overlap_frames=4, max_queued_windows=2)
    svc.warmup()
    # pause the dispatcher so the queue can fill
    svc._stop.set()
    svc._worker.join(timeout=10)
    svc._completer.join(timeout=10)
    # 1 queued window + an immediate timeout -> dead request in the queue
    with pytest.raises(TimeoutError):
        svc.transcribe(np.zeros(SEQ, np.float32), timeout=0.05)
    # 4-window request can only enqueue 1 more (maxsize 2) -> 503-class
    with pytest.raises(ServiceOverloaded):
        svc.transcribe(np.zeros(SEQ * 4, np.float32))
    assert svc._queue.qsize() == 2  # both enqueued windows now dead
    # resume dispatching: dead windows must be skipped, live work served
    svc._stop.clear()
    svc._worker = threading.Thread(target=svc._dispatch_loop, daemon=True)
    svc._completer = threading.Thread(target=svc._completion_loop,
                                      daemon=True)
    svc._worker.start()
    svc._completer.start()
    roll = svc.transcribe(np.zeros(SEQ, np.float32))
    assert roll.shape == (FRAMES, 88)
    # only the live window went through the sampler
    assert svc.stats["windows"] == 1, svc.stats
    svc.close()


def test_http_overload_maps_to_503(service, tmp_path):
    ready = threading.Event()
    t = threading.Thread(target=serve_forever, args=(service, "127.0.0.1", 0),
                         kwargs={"ready": ready}, daemon=True)
    t.start()
    assert ready.wait(10)
    server = ready.server  # type: ignore[attr-defined]
    base = f"http://127.0.0.1:{server.server_address[1]}"
    orig = service.transcribe
    service.transcribe = lambda *a, **k: (_ for _ in ()).throw(
        ServiceOverloaded("window queue full"))
    try:
        wav_path = tmp_path / "tiny.wav"
        write_wav(wav_path, np.zeros(HOP * 4, np.float32), SR)
        req = urllib.request.Request(f"{base}/transcribe",
                                     data=wav_path.read_bytes(),
                                     method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert e.headers.get("Retry-After") == "1"
    finally:
        service.transcribe = orig
        server.shutdown()


def test_http_body_cap_and_fault_classes(service, tmp_path):
    """Oversized bodies -> 413; client decode faults -> 400; server-side
    sampler faults -> 5xx."""
    import urllib.error

    svc = TranscriptionService(service.task, service.params, max_batch=2,
                               max_wait_ms=5, max_body_mb=0.01,
                               overlap_frames=4)
    ready = threading.Event()
    t = threading.Thread(target=serve_forever, args=(svc, "127.0.0.1", 0),
                         kwargs={"ready": ready}, daemon=True)
    t.start()
    assert ready.wait(10)
    server = ready.server  # type: ignore[attr-defined]
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        req = urllib.request.Request(f"{base}/transcribe",
                                     data=b"x" * 20_000, method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 413"
        except urllib.error.HTTPError as e:
            assert e.code == 413

        # server-side fault: break the sampler, expect 5xx not 400
        wav_path = tmp_path / "tiny.wav"
        write_wav(wav_path, np.zeros(HOP * 4, np.float32), SR)
        orig = svc._run
        svc._run = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("device fell over"))
        try:
            req = urllib.request.Request(
                f"{base}/transcribe", data=wav_path.read_bytes(),
                method="POST")
            try:
                urllib.request.urlopen(req, timeout=60)
                assert False, "expected HTTP 500"
            except urllib.error.HTTPError as e:
                assert e.code == 500
        finally:
            svc._run = orig
    finally:
        server.shutdown()
        svc.close()


def test_int16_transfer_matches_f32(service):
    """transfer_dtype='int16' halves the dominant per-batch H2D transfer;
    sources are 16-bit PCM so quantization is bit-faithful to them — the
    transcribed roll must match the f32-transfer roll closely."""
    svc16 = TranscriptionService(service.task, service.params, max_batch=4,
                                 max_wait_ms=5, overlap_frames=4, seed=0,
                                 transfer_dtype="int16")
    svc16.warmup()
    rng = np.random.RandomState(1)
    clip = (rng.randn(SEQ).astype(np.float32) * 0.1)
    a = service.transcribe(clip)
    b = svc16.transcribe(clip)
    svc16.close()
    assert a.shape == b.shape
    scale = float(np.abs(a).max()) + 1e-6
    assert float(np.abs(a - b).max()) / scale < 0.05


def test_transfer_dtype_validated():
    model = models.build("ClassifierFreeDiffRoll", residual_channels=16,
                         residual_layers=2, frames=FRAMES, timesteps=4)
    params = model.init(jax.random.key(0))
    task = DiffusionTask(model, TaskConfig(timesteps=4, w=0.5))
    with pytest.raises(ValueError, match="transfer_dtype"):
        TranscriptionService(task, params, transfer_dtype="int8")


def test_detailed_timing_decomposes_stages():
    """detailed_timing=True serializes the pipeline and attributes every
    batch's wall to queue-wait / assemble / H2D / compute / D2H sums —
    the decomposition tools/profile_serve.py reads."""
    model = models.build("ClassifierFreeDiffRoll", residual_channels=16,
                         residual_layers=2, frames=FRAMES, timesteps=4)
    params = model.init(jax.random.key(0))
    task = DiffusionTask(model, TaskConfig(timesteps=4, w=0.5))
    svc = TranscriptionService(task, params, max_batch=2, max_wait_ms=5,
                               overlap_frames=4, detailed_timing=True)
    assert svc.pipeline_depth == 1  # stages must not overlap
    svc.warmup()
    svc.transcribe(np.zeros(SEQ, np.float32))
    for k in ("sum_queue_wait_s", "sum_assemble_s", "sum_h2d_s",
              "sum_compute_s", "sum_d2h_s"):
        assert k in svc.stats and svc.stats[k] >= 0.0, (k, svc.stats)
    assert svc.stats["sum_compute_s"] > 0.0
    svc.close()


def test_pipelined_batches_overlap_under_load(service):
    """pipeline_depth=2 (the default) keeps request semantics identical
    under concurrent load while batches flow through the completion
    thread; batch wall time is recorded."""
    results = {}

    def run(i):
        results[i] = service.transcribe(
            np.random.RandomState(i).randn(SEQ).astype(np.float32) * 0.1)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 6
    assert all(r.shape == (FRAMES, 88) for r in results.values())
    assert service.stats.get("sum_batch_wall_s", 0.0) > 0.0
