"""Progressive-distillation math: targets that make one student DDIM step
land where two teacher steps do.

Progressive distillation (Salimans & Ho, arXiv 2202.00512) halves a
deterministic sampler's step count per stage: a student is trained so that
ONE strided DDIM step t -> tp from x_t reproduces the teacher's TWO steps
t -> tm -> tp. Guided distillation (Meng et al., arXiv 2210.03142) folds
classifier-free guidance into the first stage: the teacher's prediction is
the already-mixed (1+w)*cond - w*uncond, so every student needs only ONE
forward per step where the reference's CFG sampler needs two
(reference task/diffusion.py:951-953).

The reference has no counterpart — it always walks all 200 steps with two
forwards each (task/diffusion.py:779). Everything here is pure math over
`Schedule` tables; the training loop lives in train/distill.py.

All functions take per-example `t` vectors (shape (B,)) so one batch mixes
transitions, exactly like diffusion training mixes timesteps.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .loop import timestep_subsequence
from .schedule import Schedule


def distill_grids(timesteps: int, student_steps: int) -> Tuple[np.ndarray, np.ndarray]:
    """(student grid, teacher midpoints) for one distillation stage.

    Built from ONE strided subsequence of 2n-1 points so the nesting is
    exact: the student grid is every other teacher point, and each student
    transition's midpoint is the teacher point it skips. That keeps every
    later-stage teacher queried ONLY at timesteps it was itself trained on
    (sampling with `sampling_steps=student_steps` uses the identical grid,
    because linspace(0, T-1, 2n-1)[::2] == linspace(0, T-1, n)).

    Returns descending int32 arrays: student (n,), midpoints (n-1,).
    """
    if student_steps < 2:
        raise ValueError("student_steps must be >= 2")
    teacher = timestep_subsequence(timesteps, 2 * student_steps - 1)
    if len(teacher) != 2 * student_steps - 1:
        raise ValueError(
            f"cannot build a {2 * student_steps - 1}-point teacher grid "
            f"inside {timesteps} timesteps; lower student_steps"
        )
    student = teacher[::2]
    mid = teacher[1::2]
    return student.astype(np.int32), mid.astype(np.int32)


def _gather(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    coef = table[t]
    return coef.reshape(coef.shape + (1,) * (ndim - 1))


def ddim_x0_vec(
    schedule: Schedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    tp: jnp.ndarray,
    x0: jnp.ndarray,
) -> jnp.ndarray:
    """Deterministic DDIM x0-step with per-example (B,) timesteps — the
    vectorized twin of samplers.ddim_x0_step (same closed form, reference
    task/diffusion.py:855-875). tp == -1 emits x0 / sac[0] like the
    reference's t==0 branch."""
    nd = x.ndim
    sac = schedule.sqrt_alphas_cumprod
    s1m = schedule.sqrt_one_minus_alphas_cumprod
    tpc = jnp.maximum(tp, 0)
    a_t = _gather(sac, t, nd)
    a_p = _gather(sac, tpc, nd)
    b = _gather(s1m, tpc, nd) / _gather(s1m, t, nd)
    mean_t = a_p * x0 + b * (x - a_t * x0)
    done = (tp < 0).reshape(tp.shape + (1,) * (nd - 1))
    return jnp.where(done, x0 / sac[0], mean_t)


def ddim_x0_target(
    schedule: Schedule,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    tp: jnp.ndarray,
    x_tp: jnp.ndarray,
) -> jnp.ndarray:
    """Invert the DDIM x0-step: the x0 a student must predict at (x_t, t)
    for its single step t -> tp to land exactly on `x_tp`.

    The step is linear in the prediction,
        x_tp = (a_p - b*a_t) * x0 + b * x_t,   b = s1m[tp]/s1m[t],
    and the x0 coefficient is strictly positive for tp < t (alphas_cumprod
    is strictly decreasing), so the inversion is exact and stable.
    For tp == -1 (the final step emits x0 / sac[0]) the target is
    x_tp * sac[0]."""
    nd = x_t.ndim
    sac = schedule.sqrt_alphas_cumprod
    s1m = schedule.sqrt_one_minus_alphas_cumprod
    tpc = jnp.maximum(tp, 0)
    a_t = _gather(sac, t, nd)
    a_p = _gather(sac, tpc, nd)
    b = _gather(s1m, tpc, nd) / _gather(s1m, t, nd)
    coef = a_p - b * a_t
    target = (x_tp - b * x_t) / coef
    done = (tp < 0).reshape(tp.shape + (1,) * (nd - 1))
    return jnp.where(done, x_tp * sac[0], target)


def truncated_snr_weight(
    schedule: Schedule, t: jnp.ndarray, ndim: int,
    clip: float = 1.0, cap: Optional[float] = 5.0,
) -> jnp.ndarray:
    """Clamped-SNR loss weight for x0-space distillation losses.

    Salimans & Ho §4 use max(SNR(t), clip) ('truncated SNR') so the loss
    does not vanish at high t. Unbounded, though, SNR(0) is ~1/beta_0 ~ 1e4
    on the reference's linear schedule, and that term magnifies any low-t
    drift into loss spikes (measured: stages diverge late in training).
    `cap` bounds it above (min-SNR-gamma weighting, Hang et al.
    arXiv 2303.09556, gamma=5); None restores the unbounded form."""
    sac = schedule.sqrt_alphas_cumprod
    s1m = schedule.sqrt_one_minus_alphas_cumprod
    snr = (sac[t] / s1m[t]) ** 2
    w = jnp.maximum(snr, clip)
    if cap is not None:
        w = jnp.minimum(w, cap)
    return w.reshape(t.shape + (1,) * (ndim - 1))
