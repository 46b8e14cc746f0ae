"""Reverse-diffusion sampler steps as pure functions.

Each of the reference's nine samplers (reference task/diffusion.py:804-1055)
is re-expressed as a pure `(x_t, t, prediction, key) -> x_{t-1}` step with
`jnp.where`-based t==0 handling, so an entire T-step reverse process compiles
into one `jax.lax.scan` (see loop.py) with zero host synchronisation.

Conventions:
  * `t` is a traced scalar int32 (the current timestep index).
  * `x0` / `eps` are the model's prediction under the corresponding
    parameterisation; classifier-free-guidance mixing (`cfg_mix`) happens
    before the step, so 'cfdg_*' samplers share the plain step functions.
  * randomness is explicit: every stochastic step takes a PRNG key.

Naming matches the reference's `task.sampling.type` strings so configs are
drop-in compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .schedule import Schedule


def cfg_mix(pred_cond: jnp.ndarray, pred_uncond: jnp.ndarray, w: float) -> jnp.ndarray:
    """Classifier-free guidance: (1+w)*cond - w*uncond
    (reference task/diffusion.py:953)."""
    return (1.0 + w) * pred_cond - w * pred_uncond


def _prev(table: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """table[t-1], safely clamped at t==0 (the t==0 branch never uses it)."""
    return table[jnp.maximum(t - 1, 0)]


def ddpm_step(
    schedule: Schedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    eps: jnp.ndarray,
    key: jax.Array,
) -> jnp.ndarray:
    """Ancestral DDPM step from an epsilon prediction
    (reference task/diffusion.py:804-829)."""
    model_mean = schedule.sqrt_recip_alphas[t] * (
        x - schedule.betas[t] * eps / schedule.sqrt_one_minus_alphas_cumprod[t]
    )
    noise = jax.random.normal(key, x.shape, x.dtype)
    stoch = model_mean + jnp.sqrt(schedule.posterior_variance[t]) * noise
    return jnp.where(t == 0, model_mean, stoch)


def ddpm_x0_step(
    schedule: Schedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    x0: jnp.ndarray,
    key: jax.Array,
) -> jnp.ndarray:
    """Ancestral DDPM step from an x0 prediction — the flagship sampler's
    core update (reference task/diffusion.py:831-853, shared verbatim by
    cfdg_ddpm_x0 :943-969, generation_ddpm_x0 :971-997 and
    inpainting_ddpm_x0 :999-1025)."""
    sac = schedule.sqrt_alphas_cumprod
    s1m = schedule.sqrt_one_minus_alphas_cumprod

    sigma = (_prev(s1m, t) / s1m[t]) * jnp.sqrt(1.0 - schedule.alphas[t])
    noise = jax.random.normal(key, x.shape, x.dtype)
    mean_t = (
        _prev(sac, t) * x0
        + jnp.sqrt(1.0 - _prev(sac, t) ** 2 - sigma**2) * (x - sac[t] * x0) / s1m[t]
        + sigma * noise
    )
    mean_0 = x0 / sac[0]
    return jnp.where(t == 0, mean_0, mean_t)


def ddim_x0_step(
    schedule: Schedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    x0: jnp.ndarray,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Deterministic DDIM step from an x0 prediction
    (reference task/diffusion.py:855-875; also cfdg_ddim_x0 :1027-1055)."""
    sac = schedule.sqrt_alphas_cumprod
    s1m = schedule.sqrt_one_minus_alphas_cumprod
    mean_t = _prev(sac, t) * x0 + jnp.sqrt(1.0 - _prev(sac, t) ** 2) * (
        x - sac[t] * x0
    ) / s1m[t]
    mean_0 = x0 / sac[0]
    return jnp.where(t == 0, mean_0, mean_t)


def ddim_step(
    schedule: Schedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    eps: jnp.ndarray,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Deterministic DDIM step from an epsilon prediction
    (reference task/diffusion.py:877-892)."""
    sac = schedule.sqrt_alphas_cumprod
    s1m = schedule.sqrt_one_minus_alphas_cumprod
    x0_from_eps = (x - s1m[t] * eps) / sac[t]
    mean_t = _prev(sac, t) * x0_from_eps + _prev(s1m, t) * eps
    return jnp.where(t == 0, x0_from_eps, mean_t)


def ddim2ddpm_step(
    schedule: Schedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    eps: jnp.ndarray,
    key: jax.Array,
) -> jnp.ndarray:
    """DDIM-form update with the DDPM sigma (reference
    task/diffusion.py:894-911)."""
    sac = schedule.sqrt_alphas_cumprod
    s1m = schedule.sqrt_one_minus_alphas_cumprod
    x0_from_eps = (x - s1m[t] * eps) / sac[t]
    sigma = (_prev(s1m, t) / s1m[t]) * jnp.sqrt(1.0 - schedule.alphas[t])
    noise = jax.random.normal(key, x.shape, x.dtype)
    mean_t = (
        _prev(sac, t) * x0_from_eps
        + jnp.sqrt(1.0 - _prev(sac, t) ** 2 - sigma**2) * eps
        + sigma * noise
    )
    return jnp.where(t == 0, x0_from_eps, mean_t)


# Registry keyed by the reference's `task.sampling.type` strings.
# parameterisation: what the model predicts; guidance: how many model branches
# the step consumes (handled by the task layer's prediction function).
SAMPLER_TABLE = {
    # name                  step fn         param      guided  stochastic
    "ddpm":                (ddpm_step,      "epsilon", False,  True),
    "ddpm_x0":             (ddpm_x0_step,   "x_0",     False,  True),
    "ddim":                (ddim_step,      "epsilon", False,  False),
    "ddim_x0":             (ddim_x0_step,   "x_0",     False,  False),
    "ddim2ddpm":           (ddim2ddpm_step, "epsilon", False,  True),
    "cfdg_ddpm_x0":        (ddpm_x0_step,   "x_0",     True,   True),
    "cfdg_ddim_x0":        (ddim_x0_step,   "x_0",     True,   False),
    "generation_ddpm_x0":  (ddpm_x0_step,   "x_0",     False,  True),
    "inpainting_ddpm_x0":  (ddpm_x0_step,   "x_0",     True,   True),
}
