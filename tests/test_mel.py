"""Golden-value tests for the mel front-end against torch.stft (the same
native STFT kernel torchaudio's MelSpectrogram wraps) plus closed-form
filterbank checks, per the test strategy in SURVEY.md §4."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from diffroll_tpu.dsp.mel import (
    MelConfig,
    MelSpectrogram,
    hann_window,
    hz_to_mel_htk,
    mel_filterbank,
    mel_to_hz_htk,
    log_mel,
    trim_frames,
)

CFG = MelConfig()  # the config/spec/mel.yaml values


def _torch_power_spec(wav: np.ndarray, cfg: MelConfig) -> np.ndarray:
    """Oracle: torch.stft with torchaudio MelSpectrogram's settings
    (center/reflect, periodic hann, onesided) + normalized=True scaling."""
    x = torch.from_numpy(wav)
    win = torch.hann_window(cfg.n_fft, periodic=True, dtype=torch.float32)
    spec = torch.stft(
        x,
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        window=win,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    power = spec.abs() ** 2  # (B, n_freqs, n_frames)
    if cfg.normalized:
        power = power / win.pow(2).sum()
    return power.transpose(1, 2).numpy()  # -> (B, n_frames, n_freqs)


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        hann_window(2048),
        torch.hann_window(2048, periodic=True).numpy(),
        atol=3e-7,  # one fp32 ulp: torch evaluates cos in a different order
    )


def test_htk_mel_roundtrip():
    f = np.array([0.0, 440.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz_htk(hz_to_mel_htk(f)), f, rtol=1e-10)
    # known anchor: 1000 Hz ~ 1000 mel in the HTK scale
    assert abs(hz_to_mel_htk(1000.0) - 999.99) < 0.1


def test_filterbank_shape_and_support():
    fb = mel_filterbank(CFG.n_freqs, 0.0, 8000.0, CFG.n_mels, CFG.sample_rate)
    assert fb.shape == (1025, 229)
    assert np.all(fb >= 0)
    # no energy above f_max=8000Hz == nyquist here, every filter nonempty
    assert np.all(fb.sum(axis=0) > 0)
    # each filter peaks at <= 1 (norm=None triangular)
    assert fb.max() <= 1.0 + 1e-6
    # filter centers are monotonically increasing in frequency
    centers = fb.argmax(axis=0)
    assert np.all(np.diff(centers.astype(int)) >= 0)


@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_power_spectrogram_matches_torch_stft(method):
    rng = np.random.default_rng(0)
    wav = rng.normal(size=(2, 16000)).astype(np.float32)
    cfg = MelConfig(method=method)
    mel = MelSpectrogram(cfg)
    got = np.asarray(mel.power_spectrogram(jnp.asarray(wav)))
    want = _torch_power_spec(wav, cfg)
    assert got.shape == want.shape == (2, 16000 // 512 + 1, 1025)
    # compare in the log domain the model consumes: tiny power bins carry
    # large relative fp32 error but are irrelevant after log(x + 1e-6)
    np.testing.assert_allclose(
        np.log(got + 1e-6), np.log(want + 1e-6), rtol=1e-4, atol=5e-3
    )


def test_frame_count_for_reference_clip():
    # 327,680 samples @ hop 512 center=True -> 641 frames
    # (reference trims to the 640-frame roll, model/diffwave.py:30-39)
    assert CFG.num_frames(327680) == 641


def test_mel_spectrogram_end_to_end_sine():
    """A pure 440 Hz tone concentrates mel energy at the right filter."""
    sr = CFG.sample_rate
    t = np.arange(2 * sr) / sr
    wav = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[None]
    mel = MelSpectrogram(CFG)
    out = np.asarray(mel(jnp.asarray(wav)))
    assert out.shape == (1, 2 * sr // 512 + 1, 229)
    # peak mel bin should correspond to ~440 Hz
    peak_bin = out.mean(axis=1)[0].argmax()
    fb = mel_filterbank(CFG.n_freqs, 0.0, 8000.0, CFG.n_mels, sr)
    freqs = np.linspace(0, sr / 2, CFG.n_freqs)
    peak_freq = freqs[fb[:, peak_bin].argmax()]
    assert abs(peak_freq - 440.0) < 60.0


def test_fft_and_matmul_paths_agree():
    rng = np.random.default_rng(1)
    wav = rng.normal(size=(1, 32768)).astype(np.float32)
    a = np.asarray(MelSpectrogram(MelConfig(method="fft"))(jnp.asarray(wav)))
    b = np.asarray(MelSpectrogram(MelConfig(method="matmul"))(jnp.asarray(wav)))
    np.testing.assert_allclose(
        np.log(a + 1e-6), np.log(b + 1e-6), rtol=1e-4, atol=5e-3
    )


def test_log_mel_floor():
    out = np.asarray(log_mel(jnp.zeros((1, 4, 229))))
    np.testing.assert_allclose(out, np.log(1e-6), rtol=1e-5)


def test_trim_frames():
    roll = jnp.zeros((2, 640, 88))
    spec = jnp.zeros((2, 641, 229))
    r, s = trim_frames(roll, spec)
    assert r.shape == (2, 640, 88)
    assert s.shape == (2, 640, 229)


def test_matmul_bf16_close():
    """The single-pass (bf16-on-MXU) matmul-DFT mel — the bf16 TRAIN-path
    front-end (models/base.py switches to it for bf16 models) — stays
    within ~bf16 resolution of the f32 FFT path after log + min-max
    normalize, i.e. below what the downstream bf16 convs can even see.
    CPU's Precision.DEFAULT is f32, so bf16 input rounding is emulated."""
    import jax.numpy as jnp

    from diffroll_tpu.dsp.mel import MelConfig, MelSpectrogram, log_mel
    from diffroll_tpu.dsp.normalize import min_max_normalize

    rng = np.random.RandomState(0)
    wav = (rng.randn(2, 32 * 512) * 0.1).astype(np.float32)

    ref = MelSpectrogram(MelConfig(method="fft"))
    m_ref = np.asarray(min_max_normalize(
        log_mel(ref(jnp.asarray(wav))), 0.0, 1.0, "imagewise"))

    m = MelSpectrogram(MelConfig(method="matmul", precision="default"))
    frames = np.asarray(m._frame(jnp.asarray(wav)))
    as_bf16 = lambda x: np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    re = as_bf16(frames) @ as_bf16(m._cos) / m._win_norm
    im = as_bf16(frames) @ as_bf16(m._sin) / m._win_norm
    mel = (re * re + im * im) @ m._fb
    got = np.asarray(min_max_normalize(
        log_mel(jnp.asarray(mel)), 0.0, 1.0, "imagewise"))

    err = np.abs(got - m_ref)
    assert err.max() < 0.03, err.max()
    assert err.mean() < 0.005, err.mean()


def test_bf16_model_auto_selects_conv_mel():
    """bf16 models switch the mel front-end to the single-pass strided-conv
    DFT unless mel.method/precision were explicitly pinned (f32 models on
    the CPU test backend keep fft; on TPU they get conv at highest)."""
    from diffroll_tpu import models

    m16 = models.build("ClassifierFreeDiffRoll", residual_channels=8,
                       residual_layers=1, frames=32, dtype="bfloat16")
    assert m16.mel.config.method == "conv"
    assert m16.mel.config.precision == "default"
    m32 = models.build("ClassifierFreeDiffRoll", residual_channels=8,
                       residual_layers=1, frames=32)
    assert m32.mel.config.method == "fft"  # CPU backend in tests
    # explicit user choice wins
    import dataclasses

    pinned = models.build(
        "ClassifierFreeDiffRoll", residual_channels=8, residual_layers=1,
        frames=32, dtype="bfloat16",
        mel=dataclasses.replace(m32.mel.config, method="matmul"))
    assert pinned.mel.config.precision == "highest"


def test_mel_auto_select_guards_conv_divisibility():
    """The conv auto-switch requires hop_length | n_fft; a geometry like
    hop=160 (which the conv path rejects at call time) must fall back to
    the matmul DFT instead of raising on the first mel call."""
    import dataclasses

    import jax.numpy as jnp

    from diffroll_tpu import models
    from diffroll_tpu.dsp.mel import MelConfig

    mel = MelConfig(hop_length=160, n_fft=2048)
    assert mel.n_fft % mel.hop_length != 0
    m = models.build("ClassifierFreeDiffRoll", residual_channels=8,
                     residual_layers=1, frames=32, dtype="bfloat16", mel=mel)
    assert m.mel.config.method == "matmul"
    # and the conditioner actually evaluates
    spec = m.conditioner(waveform=jnp.zeros((1, 32 * 160)))
    assert spec.shape == (1, 32, m.config.n_mels)


def test_conv_mel_matches_fft():
    """The strided-conv DFT path (TPU default) matches the FFT path to
    float tolerance at full precision — same contract as the matmul path,
    with no materialized frame tensor."""
    import jax.numpy as jnp

    from diffroll_tpu.dsp.mel import MelConfig, MelSpectrogram

    rng = np.random.RandomState(0)
    wav = (rng.randn(3, 32 * 512 + 123) * 0.3).astype(np.float32)
    ref = np.asarray(MelSpectrogram(MelConfig(method="fft"))(jnp.asarray(wav)))
    got = np.asarray(
        MelSpectrogram(MelConfig(method="conv"))(jnp.asarray(wav)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5 * max(1.0, ref.max()))
