"""Reverse-diffusion sampler steps as pure functions.

Each of the reference's nine samplers (reference task/diffusion.py:804-1055)
is re-expressed as a pure `(x_t, t, t_prev, prediction, key) -> x_{t_prev}`
step with `jnp.where`-based final-step handling, so an entire reverse
process compiles into one `jax.lax.scan` (see loop.py) with zero host
synchronisation.

Conventions:
  * `t` is a traced scalar int32 (the current timestep index); `t_prev` is
    the NEXT index visited (t-1 in the dense reference schedule; an
    arbitrary smaller index under strided few-step sampling; -1 marks the
    final step, which emits x0 / sqrt(alphas_cumprod[0]) exactly like the
    reference's t==0 branch, task/diffusion.py:846-852).
  * `x0` / `eps` are the model's prediction under the corresponding
    parameterisation; classifier-free-guidance mixing (`cfg_mix`) happens
    before the step, so 'cfdg_*' samplers share the plain step functions.
  * randomness is explicit: every stochastic step takes a PRNG key.
  * stochastic steps use the generalized DDIM sigma
    sigma^2 = (1-acum[tp])/(1-acum[t]) * (1-acum[t]/acum[tp]),
    which reduces exactly to the reference's posterior variance for
    tp == t-1.

Naming matches the reference's `task.sampling.type` strings so configs are
drop-in compatible.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .schedule import Schedule


def cfg_mix(pred_cond: jnp.ndarray, pred_uncond: jnp.ndarray, w: float) -> jnp.ndarray:
    """Classifier-free guidance: (1+w)*cond - w*uncond
    (reference task/diffusion.py:953)."""
    return (1.0 + w) * pred_cond - w * pred_uncond


def _tp(t: jnp.ndarray, t_prev: Optional[jnp.ndarray]):
    """(clamped previous index, done flag)."""
    if t_prev is None:
        t_prev = t - 1
    return jnp.maximum(t_prev, 0), t_prev < 0


def _sigma(schedule: Schedule, t, tp) -> jnp.ndarray:
    """Generalized ancestral noise scale (== sqrt(posterior_variance[t])
    when tp == t-1, reference task/diffusion.py:251-253)."""
    s1m = schedule.sqrt_one_minus_alphas_cumprod
    sac = schedule.sqrt_alphas_cumprod
    alpha_ratio = (sac[t] / sac[tp]) ** 2  # acum[t] / acum[tp]
    return (s1m[tp] / s1m[t]) * jnp.sqrt(jnp.maximum(1.0 - alpha_ratio, 0.0))


def ddpm_step(
    schedule: Schedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    eps: jnp.ndarray,
    key: jax.Array,
    t_prev: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Ancestral DDPM step from an epsilon prediction
    (reference task/diffusion.py:804-829)."""
    tp, done = _tp(t, t_prev)
    sac = schedule.sqrt_alphas_cumprod
    s1m = schedule.sqrt_one_minus_alphas_cumprod
    x0 = (x - s1m[t] * eps) / sac[t]
    sigma = _sigma(schedule, t, tp)
    noise = jax.random.normal(key, x.shape, x.dtype)
    mean_t = (
        sac[tp] * x0
        + jnp.sqrt(jnp.maximum(1.0 - sac[tp] ** 2 - sigma**2, 0.0)) * eps
        + sigma * noise
    )
    # reference's t==0 branch returns the deterministic mean
    mean_0 = schedule.sqrt_recip_alphas[t] * (
        x - schedule.betas[t] * eps / s1m[t]
    )
    return jnp.where(done, mean_0, mean_t)


def ddpm_x0_step(
    schedule: Schedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    x0: jnp.ndarray,
    key: jax.Array,
    t_prev: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Ancestral DDPM step from an x0 prediction — the flagship sampler's
    core update (reference task/diffusion.py:831-853, shared verbatim by
    cfdg_ddpm_x0 :943-969, generation_ddpm_x0 :971-997 and
    inpainting_ddpm_x0 :999-1025)."""
    tp, done = _tp(t, t_prev)
    sac = schedule.sqrt_alphas_cumprod
    s1m = schedule.sqrt_one_minus_alphas_cumprod

    sigma = _sigma(schedule, t, tp)
    noise = jax.random.normal(key, x.shape, x.dtype)
    mean_t = (
        sac[tp] * x0
        + jnp.sqrt(jnp.maximum(1.0 - sac[tp] ** 2 - sigma**2, 0.0))
        * (x - sac[t] * x0) / s1m[t]
        + sigma * noise
    )
    mean_0 = x0 / sac[0]
    return jnp.where(done, mean_0, mean_t)


def ddim_x0_step(
    schedule: Schedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    x0: jnp.ndarray,
    key: jax.Array | None = None,
    t_prev: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Deterministic DDIM step from an x0 prediction
    (reference task/diffusion.py:855-875; also cfdg_ddim_x0 :1027-1055)."""
    tp, done = _tp(t, t_prev)
    sac = schedule.sqrt_alphas_cumprod
    s1m = schedule.sqrt_one_minus_alphas_cumprod
    mean_t = sac[tp] * x0 + jnp.sqrt(1.0 - sac[tp] ** 2) * (
        x - sac[t] * x0
    ) / s1m[t]
    mean_0 = x0 / sac[0]
    return jnp.where(done, mean_0, mean_t)


def ddim_step(
    schedule: Schedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    eps: jnp.ndarray,
    key: jax.Array | None = None,
    t_prev: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Deterministic DDIM step from an epsilon prediction
    (reference task/diffusion.py:877-892)."""
    tp, done = _tp(t, t_prev)
    sac = schedule.sqrt_alphas_cumprod
    s1m = schedule.sqrt_one_minus_alphas_cumprod
    x0_from_eps = (x - s1m[t] * eps) / sac[t]
    mean_t = sac[tp] * x0_from_eps + s1m[tp] * eps
    return jnp.where(done, x0_from_eps, mean_t)


def ddim2ddpm_step(
    schedule: Schedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    eps: jnp.ndarray,
    key: jax.Array,
    t_prev: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """DDIM-form update with the DDPM sigma (reference
    task/diffusion.py:894-911)."""
    tp, done = _tp(t, t_prev)
    sac = schedule.sqrt_alphas_cumprod
    s1m = schedule.sqrt_one_minus_alphas_cumprod
    x0_from_eps = (x - s1m[t] * eps) / sac[t]
    sigma = _sigma(schedule, t, tp)
    noise = jax.random.normal(key, x.shape, x.dtype)
    mean_t = (
        sac[tp] * x0_from_eps
        + jnp.sqrt(jnp.maximum(1.0 - sac[tp] ** 2 - sigma**2, 0.0)) * eps
        + sigma * noise
    )
    return jnp.where(done, x0_from_eps, mean_t)


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
