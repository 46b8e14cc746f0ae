"""Training losses (reference `p_losses`, task/diffusion.py:792-802)."""

from __future__ import annotations

import jax.numpy as jnp
import optax


def p_losses(label: jnp.ndarray, prediction: jnp.ndarray, loss_type: str) -> jnp.ndarray:
    """Mean loss between label and prediction; 'l1' | 'l2' | 'huber'.

    'huber' matches torch smooth_l1_loss (beta=1), which optax calls
    huber_loss with delta=1.
    """
    if loss_type == "l1":
        return jnp.mean(jnp.abs(label - prediction))
    if loss_type == "l2":
        return jnp.mean((label - prediction) ** 2)
    if loss_type == "huber":
        return jnp.mean(optax.losses.huber_loss(prediction, label, delta=1.0))
    raise NotImplementedError(f"loss_type {loss_type!r}")
