"""Progressive (and guided) distillation training.

Each stage halves the sampler's step count: a student initialized from the
teacher learns to cover two teacher DDIM steps in one (math in
diffusion/distill.py). The FIRST stage can also fold classifier-free
guidance into the student (teacher prediction = (1+w)*cond - w*uncond), so
the distilled model transcribes with ONE forward per step — against the
reference's 200 steps x 2 forwards (reference task/diffusion.py:779,
951-953), a chain of k stages yields a 2^k x step reduction AND a 2x
per-step reduction.

Distilled checkpoints sample through the ordinary machinery: load the
student params and set `task.sampling_type=ddim_x0` (or ddpm_x0),
`task.sampling_steps=<stage steps>` — the strided loop and the whole-
process Pallas kernel both already take this path.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.experiment import DistillConfig
from ..diffusion.distill import (
    ddim_x0_target,
    ddim_x0_vec,
    distill_grids,
    truncated_snr_weight,
)
from ..diffusion.forward import q_sample
from ..diffusion.samplers import cfg_mix
from .state import TrainState, make_optimizer
from .step import make_train_step


__all__ = [
    "DistillConfig",
    "make_distill_loss",
    "distill_stage",
    "progressive_distill",
]


def make_distill_loss(
    model: Any,
    schedule: Any,
    teacher_params: Any,
    student_grid: np.ndarray,
    midpoints: np.ndarray,
    guided: bool,
    w: float,
    snr_clip: float = 1.0,
    snr_cap: Optional[float] = 5.0,
    conditioner: Optional[Callable[[Dict], jnp.ndarray]] = None,
):
    """Build a `(params, batch, key, train) -> (loss, (losses, tensors))`
    distillation loss compatible with `make_train_step`.

    Per example: draw a student transition (t, tm, tp) uniformly (including
    the final t=0 -> done transition, whose target is the teacher's own x0
    prediction at t=0), form x_t ~ q(x_t|x0_data), run the frozen teacher
    two DDIM steps, invert the student's single step for its x0 target, and
    regress with truncated-SNR weighting."""
    grid = jnp.asarray(student_grid)
    mids = jnp.asarray(midpoints)
    n = len(student_grid)
    frozen = jax.lax.stop_gradient(teacher_params)

    if conditioner is None:
        conditioner = lambda batch: model.conditioner(waveform=batch["audio"])

    def teacher_predict(x, t, cond):
        if guided:
            pc, pu = model.apply_cfg(frozen, x, t, cond=cond)
            return cfg_mix(pc, pu, w)
        return model.apply(frozen, x, t, cond, None)

    def loss_fn(params, batch, key, train: bool = True):
        del train
        # batches may arrive packed for the H2D transfer (int16 audio /
        # uint8 rolls, data/pipeline.pack_batch) — same contract as the
        # supervised loss (tasks/diffusion.py); unpack is a no-op on f32
        from ..data.pipeline import unpack_batch

        batch = unpack_batch(batch)
        roll = model.normalize_roll(batch["frame"])
        bsz = roll.shape[0]
        cond = conditioner(batch)

        i_key, n_key = jax.random.split(key)
        # i == n-1 is the final transition: t = grid[-1] (0), tp = -1
        i = jax.random.randint(i_key, (bsz,), 0, n)
        t = grid[i]
        last = i >= n - 1
        tm = jnp.where(last, 0, mids[jnp.minimum(i, n - 2)])
        tp = jnp.where(last, -1, grid[jnp.minimum(i + 1, n - 1)])

        noise = jax.random.normal(n_key, roll.shape, roll.dtype)
        x_t = q_sample(roll, t, schedule, noise)

        # teacher: two DDIM steps t -> tm -> tp (one step when tp == -1:
        # the second step collapses because x_tm == x_t at t == tm == 0)
        x0_a = teacher_predict(x_t, t, cond)
        x_tm = ddim_x0_vec(schedule, x_t, t, tm, x0_a)
        x_tm = jnp.where(
            last.reshape((-1,) + (1,) * (roll.ndim - 1)), x_t, x_tm)
        x0_b = teacher_predict(x_tm, tm, cond)
        x_tp = ddim_x0_vec(schedule, x_tm, tm, tp, x0_b)

        target = jax.lax.stop_gradient(
            ddim_x0_target(schedule, x_t, t, tp, x_tp))
        pred = model.apply(params, x_t, t, cond, None)
        wgt = truncated_snr_weight(schedule, t, roll.ndim, snr_clip,
                                   snr_cap)
        loss = jnp.mean(wgt * (pred - target) ** 2)
        losses = {"distill_loss": loss}
        tensors = {"pred_roll": pred, "label_roll": roll, "spec": cond}
        return loss, (losses, tensors)

    return loss_fn


def distill_stage(
    model: Any,
    schedule: Any,
    teacher_params: Any,
    batches: Iterator[Any],
    timesteps: int,
    student_steps: int,
    n_steps: int,
    lr: float,
    guided: bool = False,
    w: float = 0.0,
    snr_clip: float = 1.0,
    snr_cap: Optional[float] = 5.0,
    mesh: Optional[Any] = None,
    log: Optional[Callable[[int, float], None]] = None,
    conditioner: Optional[Callable[[Dict], jnp.ndarray]] = None,
) -> Tuple[Any, float]:
    """One halving: train a student (initialized from the teacher) on the
    `student_steps` grid. Returns (student params, final-step loss).
    `conditioner` overrides the default waveform->mel conditioner (e.g.
    the debug roll conditioner in tests)."""
    student_grid, midpoints = distill_grids(timesteps, student_steps)
    loss_fn = make_distill_loss(
        model, schedule, teacher_params, student_grid, midpoints,
        guided=guided, w=w, snr_clip=snr_clip, snr_cap=snr_cap,
        conditioner=conditioner,
    )
    tx = make_optimizer(lr)
    # student initialized from the teacher — COPIED, because the train step
    # donates its state buffers and the caller still holds the teacher
    state = TrainState.create(
        jax.tree_util.tree_map(jnp.copy, teacher_params), tx)
    step = make_train_step(loss_fn, tx, mesh=mesh,
                           state_example=state if mesh is not None else None)
    key = jax.random.key(np.int64(student_steps) * 7919 + 13)
    losses: Dict[str, jnp.ndarray] = {}
    for it in range(n_steps):
        batch = next(batches)
        key, k = jax.random.split(key)
        state, losses = step(state, batch, k)
        if log is not None and (it % 100 == 0 or it == n_steps - 1):
            log(it, float(losses["distill_loss"]))
    # the final-step loss is read AFTER the loop so it costs one device
    # fetch regardless of logging
    last = float(losses["distill_loss"]) if losses else float("nan")
    return state.params, last


def progressive_distill(
    model: Any,
    schedule: Any,
    params: Any,
    batches: Iterator[Any],
    timesteps: int,
    config: DistillConfig = DistillConfig(),
    mesh: Optional[Any] = None,
    log: Optional[Callable[[str], None]] = None,
) -> Dict[int, Any]:
    """Run the full halving chain. Returns {student_steps: params} for
    every stage (teacher guidance is folded only into the first)."""
    out: Dict[int, Any] = {}
    teacher = params
    for stage, n in enumerate(config.stage_steps()):
        guided = config.fold_guidance and stage == 0
        if log is not None:
            log(f"stage {stage}: distilling to {n} steps"
                + (" (folding CFG)" if guided else ""))
        teacher, last = distill_stage(
            model, schedule, teacher, batches, timesteps, n,
            n_steps=config.steps_per_stage, lr=config.lr, guided=guided,
            w=config.w, snr_clip=config.snr_clip, snr_cap=config.snr_cap,
            mesh=mesh,
            log=(lambda it, v: log(f"  step {it}: distill_loss {v:.5f}"))
            if log is not None else None,
        )
        out[n] = teacher
    return out
