"""Discriminative (one-shot) baseline task.

Re-expression of the reference `SpecRollBaseline` (reference
task/baseline.py:41-482): a spec->roll regression dressed in diffusion
clothing. The network gets a dummy x_t and a dummy timestep and must
predict the roll from the spectrogram alone in one forward; `amt_loss` is
MSE against the (unnormalized) roll (reference :455-456).

Quirks preserved / fixed:
  * time_mode 'constant' (t=1), 'constant_maxT' (t=T-1), 'random'
    (t ~ U[0,100)) — reference :436-443.
  * x_t mode 'zeros' or 'gaussian'; the reference's 'gaussian' actually
    draws UNIFORM noise (`torch.rand_like`, :446-449) — preserved, since
    training and eval must agree on the dummy-input distribution.
  * the reference's reverse_diffusion runs the forward pass twice
    (:313 & :320, flagged in SURVEY.md §7) — we run it once.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..diffusion.loop import sample_loop
from ..diffusion.samplers import ddpm_x0_step
from ..diffusion.schedule import linear_schedule
from ..models.base import DiffRollModel


@dataclasses.dataclass(frozen=True)
class BaselineConfig:
    """Mirrors config/task/baseline.yaml."""

    timesteps: int = 200
    beta_start: float = 1e-4
    beta_end: float = 0.02
    loss_keys: Tuple[str, ...] = ("amt_loss",)
    frame_threshold: float = 0.6
    time_mode: str = "constant_maxT"   # 'constant' | 'constant_maxT' | 'random'
    x_t: str = "gaussian"              # 'zeros' | 'gaussian' (uniform, see above)
    lr: float = 5e-5

    def replace(self, **kw) -> "BaselineConfig":
        return dataclasses.replace(self, **kw)


class BaselineTask:
    def __init__(self, model: DiffRollModel, config: BaselineConfig = BaselineConfig()):
        self.model = model
        self.config = config
        self.schedule = linear_schedule(
            config.beta_start, config.beta_end, config.timesteps
        )

    def _dummy_inputs(self, key: jax.Array, shape, dtype):
        cfg = self.config
        bsz = shape[0]
        if cfg.time_mode == "constant":
            t = jnp.ones((bsz,), jnp.int32)
        elif cfg.time_mode == "constant_maxT":
            t = jnp.full((bsz,), cfg.timesteps - 1, jnp.int32)
        elif cfg.time_mode == "random":
            t = jax.random.randint(key, (bsz,), 0, 100)
        else:
            raise ValueError(f"time_mode {cfg.time_mode!r} is not recognized")

        if cfg.x_t == "zeros":
            x_t = jnp.zeros(shape, dtype)
        elif cfg.x_t == "gaussian":
            x_t = jax.random.uniform(jax.random.fold_in(key, 1), shape, dtype)
        else:
            raise ValueError(f"x_t {cfg.x_t!r} is not recognized")
        return x_t, t

    def loss_fn(
        self, params: Any, batch: Dict[str, jnp.ndarray], key: jax.Array,
        train: bool = True,
    ):
        del train
        from ..data.pipeline import unpack_batch

        batch = unpack_batch(batch)  # packed-transfer batches (int16/uint8)
        roll = batch["frame"]  # NOT normalized (reference task/baseline.py:427)
        x_t, t = self._dummy_inputs(key, roll.shape, roll.dtype)
        cond = self.model.conditioner(waveform=batch["audio"])
        pred = self.model.apply(params, x_t, t, cond, None)
        amt_loss = jnp.mean((pred - roll) ** 2)
        losses = {"amt_loss": amt_loss}
        tensors = {"pred_roll": pred, "label_roll": roll, "spec": cond}
        total = sum(losses[k] for k in self.config.loss_keys)
        return total, (losses, tensors)

    def sample(self, params: Any, x_T: jnp.ndarray, key: jax.Array,
               waveform: jnp.ndarray, record_every=None, mesh=None):
        """Iterative eval loop (reference test path, task/baseline.py:302-334):
        an x0-parameterised DDPM walk where the network ignores t anyway.
        `mesh` is accepted for interface parity with DiffusionTask.sample;
        the scan path partitions under GSPMD without it."""
        del mesh
        cond = self.model.conditioner(waveform=waveform)

        def step(x, t, t_prev, k):
            t_vec = jnp.full((x.shape[0],), t, jnp.int32)
            x0 = self.model.apply(params, x, t_vec, cond, None)
            return ddpm_x0_step(self.schedule, x, t, x0, k, t_prev=t_prev)

        return sample_loop(step, x_T, self.config.timesteps, key, record_every)

    def predict(self, params: Any, batch: Dict[str, jnp.ndarray], key: jax.Array):
        """One-shot prediction (the baseline's actual strength)."""
        roll_shape = batch["frame"].shape
        x_t, t = self._dummy_inputs(key, roll_shape, batch["frame"].dtype)
        cond = self.model.conditioner(waveform=batch["audio"])
        return self.model.apply(params, x_t, t, cond, None)
