"""Log-mel spectrogram front-end, TPU-native.

Replaces the reference's torchaudio `MelSpectrogram` (reference
model/diffwave.py:312, 635; config/spec/mel.yaml:1-10) with a hand-rolled
JAX pipeline whose numerics match torchaudio's defaults:

  * center=True with reflect padding of n_fft//2 samples on both sides,
  * periodic Hann window of length n_fft,
  * `normalized=True` => the complex STFT is divided by sqrt(sum(win^2)),
  * power spectrum (power=2.0),
  * HTK mel filterbank (mel = 2595 log10(1 + f/700)), norm=None,
    n_freqs = n_fft//2 + 1 triangular filters between f_min and f_max.

Three STFT execution paths:
  * 'fft'    — framed rFFT via jnp.fft.rfft (lowers to the XLA FFT op),
  * 'matmul' — framed real DFT as two windowed matmuls against cos/sin
               bases (the bases are (n_fft, n_freqs) constants baked into
               the program),
  * 'conv'   — the windowed real DFT as ONE strided convolution (kernel =
               window-folded [cos | sin] bases, stride = hop): the MXU
               does the framing implicitly, so no (B, n_frames, n_fft)
               frame tensor is ever materialized. This is the TPU fast
               path: profiling showed the framing GATHER, not the
               transform, dominated both other paths (~10.7 ms fft vs
               11.1 ms matmul-highest at B=16, 20.48 s clips — the two
               agree because the shared gather is the bottleneck).

For a 20.48 s clip (sequence_length=327680, hop=512) the output is 641
frames; the model trims to the 640-frame roll grid (`trim_frames`,
reference model/diffwave.py:30-39).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax.numpy as jnp
import numpy as np


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
) -> np.ndarray:
    """Triangular HTK mel filterbank, shape (n_freqs, n_mels), norm=None —
    the torchaudio `melscale_fbanks` contract used by config/spec/mel.yaml."""
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_pts = np.linspace(hz_to_mel_htk(f_min), hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = mel_to_hz_htk(m_pts)

    f_diff = f_pts[1:] - f_pts[:-1]                      # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]         # (n_freqs, n_mels + 2)
    down_slopes = -slopes[:, :-2] / f_diff[:-1]          # rising edge
    up_slopes = slopes[:, 2:] / f_diff[1:]               # falling edge
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))
    return fb.astype(np.float32)


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class MelConfig:
    """Mirrors the reference spec config knobs (config/spec/mel.yaml:1-10)."""

    sample_rate: int = 16000
    n_fft: int = 2048
    hop_length: int = 512
    n_mels: int = 229
    f_min: float = 0.0
    f_max: Optional[float] = 8000.0
    center: bool = True
    normalized: bool = True
    pad_mode: str = "reflect"
    power: float = 2.0
    win_length: Optional[int] = None
    method: str = "fft"  # 'fft' | 'matmul' | 'conv'
    # matmul-path MXU precision: 'highest' (6-pass f32, parity with the
    # FFT path), 'high' (3-pass), 'default' (single-pass bf16 — the fast
    # train-path choice: the conditioner is consumed by bf16 convs anyway,
    # so the ~1e-2 relative power error vanishes below bf16 resolution
    # after log + min-max; see tests/test_mel.py::test_matmul_bf16_close)
    precision: str = "highest"

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, n_samples: int) -> int:
        if self.center:
            return n_samples // self.hop_length + 1
        return (n_samples - self.n_fft) // self.hop_length + 1


class MelSpectrogram:
    """Stateless callable: waveform (B, L) -> power mel spectrogram
    (B, n_frames, n_mels), channels-last (time-major) for TPU layouts.

    Note the layout difference from torchaudio, which returns (B, n_mels, T)
    (reference model/diffwave.py:643 comments `(B, n_mels, T)`); callers that
    need the reference layout transpose at the boundary.
    """

    def __init__(self, config: MelConfig = MelConfig()):
        self.config = config
        n = config.win_length or config.n_fft
        if n != config.n_fft:
            # torchaudio centers a shorter window inside the FFT frame
            win = np.zeros(config.n_fft, dtype=np.float32)
            start = (config.n_fft - n) // 2
            win[start : start + n] = hann_window(n)
        else:
            win = hann_window(config.n_fft)
        self._window = win
        self._win_norm = float(np.sqrt(np.sum(win.astype(np.float64) ** 2)))
        f_max = config.f_max if config.f_max is not None else config.sample_rate / 2
        self._fb = mel_filterbank(
            config.n_freqs, config.f_min, f_max, config.n_mels, config.sample_rate
        )
        if config.method in ("matmul", "conv"):
            # real-DFT bases with the window folded in: frame @ basis == rfft(frame*win)
            k = np.arange(config.n_freqs)[None, :]
            t = np.arange(config.n_fft)[:, None]
            ang = 2.0 * np.pi * t * k / config.n_fft
            self._cos = (np.cos(ang) * win[:, None]).astype(np.float32)
            self._sin = (-np.sin(ang) * win[:, None]).astype(np.float32)
        else:
            self._cos = self._sin = None

    def _frame(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        if cfg.center:
            pad = cfg.n_fft // 2
            x = jnp.pad(x, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
        n_frames = (x.shape[-1] - cfg.n_fft) // cfg.hop_length + 1
        idx = (
            np.arange(n_frames)[:, None] * cfg.hop_length + np.arange(cfg.n_fft)[None, :]
        )
        return x[:, idx]  # (B, n_frames, n_fft) via XLA gather

    def _prec(self):
        import jax

        return {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[self.config.precision]

    def power_spectrogram(self, waveform: jnp.ndarray) -> jnp.ndarray:
        """(B, L) -> (B, n_frames, n_freqs) power spectrum."""
        cfg = self.config
        if cfg.method == "conv":
            # chunked im2col-free DFT: reshape the padded waveform into
            # hop-sized chunks (B, q, hop) — frame t is exactly chunks
            # [t, t + n_fft/hop), so the windowed DFT is a VALID conv with
            # kernel (n_fft/hop, hop, 2*n_freqs). This shape (k=4, 512
            # input channels for the defaults) maps onto the MXU like the
            # denoiser's own convs; a naive stride-hop kernel-n_fft conv
            # over 1 input channel does NOT (measured 21 ms vs sub-ms at
            # B=16) and neither does a materialized frame gather (11 ms).
            import jax

            hop, n_fft = cfg.hop_length, cfg.n_fft
            if n_fft % hop:
                raise ValueError(
                    "method='conv' needs hop_length | n_fft; use 'matmul'")
            taps = n_fft // hop
            x = waveform.astype(jnp.float32)
            if cfg.center:
                pad = n_fft // 2
                x = jnp.pad(x, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
            q = x.shape[-1] // hop
            x = x[:, : q * hop].reshape(x.shape[0], q, hop)
            kern = jnp.concatenate(
                [jnp.asarray(self._cos), jnp.asarray(self._sin)], axis=1
            ).reshape(taps, hop, 2 * cfg.n_freqs)
            out = jax.lax.conv_general_dilated(
                x, kern, window_strides=(1,), padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
                precision=self._prec(),
            )                                   # (B, q - taps + 1, 2F)
            re = out[..., : cfg.n_freqs]
            im = out[..., cfg.n_freqs:]
            if cfg.normalized:
                re = re / self._win_norm
                im = im / self._win_norm
            power = re * re + im * im
            if cfg.power != 2.0:
                power = power ** (cfg.power / 2.0)
            return power
        frames = self._frame(waveform.astype(jnp.float32))
        if cfg.method == "matmul":
            # precision='highest' (6-pass f32) gives parity with the FFT
            # path — the 2048-term DFT dots cancel heavily for broadband
            # input. 'default' (single-pass bf16) is ~6x cheaper on the MXU
            # and adequate whenever the consumer is itself bf16 (training).
            prec = self._prec()
            re = jnp.einsum(
                "btn,nf->btf", frames, jnp.asarray(self._cos),
                precision=prec,
            )
            im = jnp.einsum(
                "btn,nf->btf", frames, jnp.asarray(self._sin),
                precision=prec,
            )
        else:
            frames = frames * jnp.asarray(self._window)
            spec = jnp.fft.rfft(frames, n=cfg.n_fft, axis=-1)
            re, im = jnp.real(spec), jnp.imag(spec)
        if cfg.normalized:
            re = re / self._win_norm
            im = im / self._win_norm
        power = re * re + im * im
        if cfg.power != 2.0:
            power = power ** (cfg.power / 2.0)
        return power

    def __call__(self, waveform: jnp.ndarray) -> jnp.ndarray:
        """(B, L) -> (B, n_frames, n_mels) mel power spectrogram."""
        power = self.power_spectrogram(waveform)
        return power @ jnp.asarray(self._fb)


def log_mel(mel: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """log(spec + eps) as applied by every reference model
    (reference model/diffwave.py:644)."""
    return jnp.log(mel + eps)


def trim_frames(roll: jnp.ndarray, spec: jnp.ndarray, time_axis: int = 1):
    """Reconcile the 641-frame centered STFT with the 640-frame roll
    (reference `trim_spec_roll`, model/diffwave.py:30-39), time-major layout."""
    t = min(roll.shape[time_axis], spec.shape[time_axis])
    roll = jnp.take(roll, np.arange(t), axis=time_axis)
    spec = jnp.take(spec, np.arange(t), axis=time_axis)
    return roll, spec


@functools.lru_cache(maxsize=8)
def default_mel(**overrides) -> MelSpectrogram:
    return MelSpectrogram(MelConfig(**overrides))
