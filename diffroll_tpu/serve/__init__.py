"""Production serving: a persistent transcription service with cross-
request micro-batching.

No reference counterpart (the reference is research scripts only); this is
the deployment tier the TPU rebuild targets. Design:

  * the model loads ONCE; one sampler program of fixed (max_batch, frames)
    shape is compiled up front — no retraces at serving time (on TPU the
    whole reverse process is the resident-weight megakernel,
    ops/sampler_kernel.py);
  * requests of ANY audio length decompose into hop-aligned 640-frame
    windows (tasks/transcribe.py); windows from CONCURRENT requests are
    batched together by a single dispatcher thread (collects up to
    `max_batch` window jobs, waiting at most `max_wait_ms` after the
    first), so throughput approaches the chip's batched rate (~206
    audio-s/s at batch 16 on one v5e) while a lone request still sees
    single-batch latency;
  * results stitch back per request (linear crossfade in window overlaps)
    and decode to note events / MIDI on host threads.

HTTP layer (stdlib ThreadingHTTPServer):
  POST /transcribe   body = WAV bytes -> JSON {notes, frames, ...}
                     ?midi=1 -> binary MIDI file instead
                     ?threshold=0.5 overrides the frame threshold
  GET  /healthz      liveness + model/config info
"""

from .service import ServiceOverloaded, TranscriptionService, serve_forever

__all__ = ["TranscriptionService", "ServiceOverloaded", "serve_forever"]
