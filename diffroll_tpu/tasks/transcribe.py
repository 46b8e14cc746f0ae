"""Arbitrary-length audio transcription: windowing + batched sampling +
overlap stitching.

The reference supports exactly one clip length — 327,680 samples = 640
frames (reference config/spec_roll.yaml:3-5; its README.md:126 leaves
longer audio as a TODO). The denoiser is fully convolutional with a tiny
receptive field, so long audio decomposes into independent fixed-size
windows: this module slices a waveform into (optionally overlapping)
640-frame windows, runs the reverse-diffusion sampler over them in fixed
batches (one compiled program; windows shard over the mesh's `data` axis
on multi-chip, since they are embarrassingly parallel), and stitches the
predicted rolls with a linear crossfade in the overlaps.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def split_windows(
    audio: np.ndarray,
    seq_len: int,
    hop_length: int = 512,
    overlap_frames: int = 0,
) -> np.ndarray:
    """(L,) waveform -> (n_win, seq_len) hop-aligned windows covering L."""
    if overlap_frames < 0 or overlap_frames * hop_length >= seq_len:
        raise ValueError("overlap must be >= 0 and smaller than the window")
    stride = seq_len - overlap_frames * hop_length
    n_win = max(1, math.ceil(max(len(audio) - seq_len, 0) / stride) + 1)
    total = (n_win - 1) * stride + seq_len
    padded = np.zeros(total, dtype=np.float32)
    padded[: len(audio)] = audio
    idx = np.arange(n_win)[:, None] * stride + np.arange(seq_len)[None, :]
    return padded[idx]


def stitch_rolls(
    rolls: np.ndarray,
    overlap_frames: int,
    total_frames: int,
) -> np.ndarray:
    """(n_win, F, 88) window rolls -> (total_frames, 88) with linear
    crossfade over the overlapped frames."""
    n_win, frames, pitches = rolls.shape
    stride = frames - overlap_frames
    out = np.zeros((max(total_frames, (n_win - 1) * stride + frames), pitches))
    weight = np.zeros(out.shape[0])

    w = np.ones(frames)
    if overlap_frames > 0:
        ramp = np.linspace(0.0, 1.0, overlap_frames + 2)[1:-1]
        w[:overlap_frames] = ramp
        w[-overlap_frames:] = ramp[::-1]
    for i in range(n_win):
        s = i * stride
        out[s: s + frames] += rolls[i] * w[:, None]
        weight[s: s + frames] += w
    out /= np.maximum(weight, 1e-8)[:, None]
    return out[:total_frames]


def transcribe_long(
    task,
    params,
    audio: np.ndarray,
    key: jax.Array,
    *,
    sample_rate: int = 16000,
    batch_size: int = 8,
    overlap_frames: int = 32,
    mesh=None,
) -> np.ndarray:
    """Transcribe a waveform of ANY length -> (n_frames, 88) roll.

    `sample_rate` is the rate of `audio`; input at any other rate than the
    model's (`model.config.mel.sample_rate`) is resampled here, so callers
    never window on the wrong grid.

    One jitted sampler of fixed (batch_size, frames, 88) shape; window
    batches are padded to that shape (no retraces) and, given a `mesh`,
    sharded over its `data` axis.
    """
    mc = task.model.config
    if sample_rate != mc.mel.sample_rate:
        from .. import native

        audio = native.resample(np.asarray(audio, np.float32),
                                sample_rate, mc.mel.sample_rate)
    frames = mc.frames
    hop = mc.mel.hop_length
    seq_len = frames * hop
    total_frames = max(1, math.ceil(len(audio) / hop))

    windows = split_windows(np.asarray(audio, np.float32), seq_len, hop,
                            overlap_frames)
    n_win = len(windows)
    if mesh is not None:
        data_axis = mesh.shape["data"]
        batch_size = max(batch_size // data_axis, 1) * data_axis

    run = jax.jit(
        lambda p, x_T, k, wav: task.sample(p, x_T, k, waveform=wav,
                                           mesh=mesh)[0]
    )

    rolls = []
    for start in range(0, n_win, batch_size):
        chunk = windows[start: start + batch_size]
        n = len(chunk)
        if n < batch_size:  # pad to the compiled shape
            chunk = np.concatenate(
                [chunk, np.zeros((batch_size - n, seq_len), np.float32)])
        key, nk, sk = jax.random.split(key, 3)
        x_T = jax.random.normal(nk, (batch_size, frames, mc.pitches))
        wav = jnp.asarray(chunk)
        if mesh is not None:
            from ..parallel.mesh import batch_sharding

            x_T = jax.device_put(x_T, batch_sharding(mesh))
            wav = jax.device_put(wav, batch_sharding(mesh))
        out = run(params, x_T, sk, wav)
        rolls.append(np.asarray(out[:n]))

    rolls = np.concatenate(rolls, axis=0)
    return stitch_rolls(rolls, overlap_frames, total_frames)
