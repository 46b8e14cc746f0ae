"""Batchwise min-max normalization.

Functional equivalent of the reference `Normalization` helper
(reference model/utils.py:2-38): per-sample min-max scaling to a target
[min, max] range in either 'imagewise' (over all non-batch elements) or
'framewise' (over the feature axis per frame) mode, with NaN-from-empty
inputs mapped to the range minimum.

Layout note: the reference operates on (B, F, T) and 'framewise' reduces
over dim 1 (the feature axis). This module is layout-agnostic: pass `axis`
explicitly for framewise mode; the framework's channels-last (B, T, F)
tensors use axis=-1.
"""

from __future__ import annotations

import jax.numpy as jnp


def min_max_normalize(
    x: jnp.ndarray,
    lo: float,
    hi: float,
    mode: str = "imagewise",
    axis: int = -1,
) -> jnp.ndarray:
    """Min-max scale `x` to [lo, hi] per sample.

    mode='imagewise': min/max over all non-batch dims (reference
    model/utils.py:22-32). mode='framewise': min/max over `axis` only
    (reference model/utils.py:12-20). Degenerate (constant) inputs produce
    NaNs in the reference; they are mapped to `lo` here, matching the
    imagewise branch. (The reference's framewise branch maps NaNs to 0
    before scaling — a quirk we do not replicate; empty frames go to `lo`.)
    """
    if mode == "imagewise":
        reduce_axes = tuple(range(1, x.ndim))
        x_min = jnp.min(x, axis=reduce_axes, keepdims=True)
        x_max = jnp.max(x, axis=reduce_axes, keepdims=True)
    elif mode == "framewise":
        x_min = jnp.min(x, axis=axis, keepdims=True)
        x_max = jnp.max(x, axis=axis, keepdims=True)
    else:
        raise ValueError(f"unknown normalization mode: {mode!r}")

    denom = x_max - x_min
    scaled = (x - x_min) / denom * (hi - lo) + lo
    # constant input => denom == 0 => NaN; map to lo
    return jnp.where(denom > 0, scaled, jnp.full_like(x, lo))


class Normalization:
    """Callable wrapper mirroring the reference constructor signature
    `Normalization(min, max, mode)` (reference model/utils.py:11)."""

    def __init__(self, lo: float, hi: float, mode: str = "imagewise", axis: int = -1):
        if mode not in ("imagewise", "framewise"):
            raise ValueError(f"unknown normalization mode: {mode!r}")
        self.lo = float(lo)
        self.hi = float(hi)
        self.mode = mode
        self.axis = axis

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return min_max_normalize(x, self.lo, self.hi, self.mode, self.axis)

    def __repr__(self) -> str:
        return f"Normalization(lo={self.lo}, hi={self.hi}, mode={self.mode!r})"
