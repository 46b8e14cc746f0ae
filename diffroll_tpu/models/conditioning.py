"""Conditioning pipeline: waveform -> conditioner tensor, plus the
classifier-free dropout / inpainting machinery, as pure functions.

In the reference all of this happens inside each model's `forward` with
in-place tensor mutation (reference model/diffwave.py:643-662, 689-699);
here it is a pure, explicitly-keyed pipeline so it jits cleanly and can be
computed ONCE per clip and reused across all 200 sampler steps (the
reference recomputes the mel spectrogram in every one of the 400 forwards
of a CFG sampling run).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..dsp.mel import MelSpectrogram, log_mel
from ..dsp.normalize import min_max_normalize


def compute_spec(
    mel: MelSpectrogram,
    waveform: jnp.ndarray,
    norm_range: Optional[Tuple[float, float]] = (0.0, 1.0),
    norm_mode: str = "imagewise",
) -> jnp.ndarray:
    """waveform (B, L) -> normalized log-mel (B, n_frames, n_mels).

    Matches the flagship front-end: MelSpectrogram -> log(x+1e-6) ->
    min-max to [0, 1] (reference model/diffwave.py:643-645, 632-633).
    Pass norm_range=None to skip normalization (DiffRollv2 skips it,
    reference model/diffwave.py:383-385).
    """
    spec = log_mel(mel(waveform))
    if norm_range is not None:
        spec = min_max_normalize(spec, norm_range[0], norm_range[1], norm_mode)
    return spec


def spec_dropout_mask(key: jax.Array, batch_size: int, p: float) -> jnp.ndarray:
    """Per-sample Bernoulli(p) unconditional mask (True => drop the
    conditioner), the classifier-free training dropout
    (reference `fixed_dropout`, model/diffwave.py:689-693)."""
    return jax.random.bernoulli(key, p, (batch_size,))


def apply_inpainting_mask(
    spec: jnp.ndarray,
    inpainting_t: Optional[Sequence[int]] = None,
    inpainting_f: Optional[Sequence[int]] = None,
    masked_value: float = -1.0,
) -> jnp.ndarray:
    """Force a time/frequency region of the conditioner to the unconditional
    value (reference model/diffwave.py:649-654). spec is (B, T, n_mels);
    `inpainting_t` indexes frames, `inpainting_f` indexes mel bins. Ranges
    are static Python ints (they come from config), so this lowers to a
    static scatter under jit.
    """
    if inpainting_t is None and inpainting_f is None:
        return spec
    t0, t1 = (0, spec.shape[1]) if inpainting_t is None else map(int, inpainting_t)
    f0, f1 = (0, spec.shape[2]) if inpainting_f is None else map(int, inpainting_f)
    return spec.at[:, t0:t1, f0:f1].set(masked_value)


def trim_to(roll_len: int, spec: jnp.ndarray) -> jnp.ndarray:
    """Trim the (641-frame) centered STFT output to the roll grid
    (reference trim_spec_roll, model/diffwave.py:30-39)."""
    return spec[:, :roll_len]
