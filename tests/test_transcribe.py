"""Long-audio transcription: windowing math, crossfade stitching, the
end-to-end pipeline on a tiny model, and window sharding over the test
mesh (windows are independent -> embarrassingly data-parallel)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffroll_tpu import models
from diffroll_tpu.parallel.mesh import make_mesh
from diffroll_tpu.tasks import DiffusionTask, TaskConfig
from diffroll_tpu.tasks.transcribe import split_windows, stitch_rolls, transcribe_long

HOP, FRAMES = 512, 32
SEQ = FRAMES * HOP


def test_split_windows_covers_everything():
    audio = np.arange(SEQ * 2 + 1000, dtype=np.float32)
    win = split_windows(audio, SEQ, HOP, overlap_frames=0)
    assert win.shape[1] == SEQ
    flat = win.reshape(-1)[: len(audio)]
    np.testing.assert_array_equal(flat, audio)


def test_split_windows_overlap_stride():
    audio = np.zeros(SEQ * 3, np.float32)
    win = split_windows(audio, SEQ, HOP, overlap_frames=8)
    stride = SEQ - 8 * HOP
    expected = int(np.ceil((len(audio) - SEQ) / stride)) + 1
    assert len(win) == expected


def test_split_windows_short_clip_pads():
    win = split_windows(np.ones(100, np.float32), SEQ, HOP, 0)
    assert win.shape == (1, SEQ)
    assert win[0, 100:].sum() == 0


def test_stitch_constant_is_identity():
    rolls = np.ones((3, FRAMES, 88))
    out = stitch_rolls(rolls, overlap_frames=8, total_frames=FRAMES * 3 - 16)
    np.testing.assert_allclose(out, 1.0, atol=1e-6)


def test_stitch_no_overlap_concatenates():
    rolls = np.stack([np.full((FRAMES, 88), i, float) for i in range(3)])
    out = stitch_rolls(rolls, 0, FRAMES * 3)
    for i in range(3):
        np.testing.assert_allclose(out[i * FRAMES: (i + 1) * FRAMES], i)


@pytest.fixture(scope="module")
def tiny_task():
    model = models.build("ClassifierFreeDiffRoll", residual_channels=16,
                         residual_layers=2, frames=FRAMES, timesteps=4)
    params = model.init(jax.random.key(0))
    task = DiffusionTask(model, TaskConfig(timesteps=4, w=0.5,
                                           sampling_type="cfdg_ddpm_x0"))
    return task, params


def test_transcribe_long_end_to_end(tiny_task):
    task, params = tiny_task
    audio = np.random.RandomState(0).randn(int(SEQ * 2.5)).astype(np.float32)
    roll = transcribe_long(task, params, audio, jax.random.key(1),
                           batch_size=2, overlap_frames=4)
    assert roll.shape == (int(np.ceil(len(audio) / HOP)), 88)
    assert np.isfinite(roll).all()


def test_transcribe_long_sharded_windows(tiny_task):
    task, params = tiny_task
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    audio = np.random.RandomState(1).randn(SEQ * 5).astype(np.float32)
    roll = transcribe_long(task, params, audio, jax.random.key(2),
                           batch_size=4, overlap_frames=0, mesh=mesh)
    assert roll.shape == (SEQ * 5 // HOP, 88)
    assert np.isfinite(roll).all()


def test_transcribe_long_resamples_foreign_rate(tiny_task):
    """Audio at a non-model sample rate is resampled internally, so the
    output frame count follows the clip's DURATION, not its raw length
    (round-1 advisor finding: the parameter used to be silently ignored)."""
    task, params = tiny_task
    seconds = SEQ * 1.5 / 16000
    audio_8k = np.random.RandomState(3).randn(int(seconds * 8000)).astype(np.float32)
    roll = transcribe_long(task, params, audio_8k, jax.random.key(4),
                           sample_rate=8000, batch_size=2, overlap_frames=0)
    expected_frames = int(np.ceil(seconds * 16000 / HOP))
    assert abs(roll.shape[0] - expected_frames) <= 1
    assert np.isfinite(roll).all()
