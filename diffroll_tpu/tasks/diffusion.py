"""Spec-conditioned piano-roll diffusion task: training losses and the
fully-fused sampling path.

This is the reference's `SpecRollDiffusion` LightningModule
(reference task/diffusion.py:219-1090) decomposed into pure functions over
an explicit (model, params, schedule, config) tuple:

  * `loss_fn`       — one training step's losses (reference `step`, :651-763)
  * `sample`        — the complete reverse process as ONE `lax.scan` inside
                      one jit (the reference loops in Python with a host
                      sync per step, :779-788)

Sampler dispatch matches `task.sampling.type` (reference binds the method
at init, :255): ddpm / ddpm_x0 / ddim / ddim_x0 / ddim2ddpm / cfdg_ddpm_x0 /
cfdg_ddim_x0 / generation_ddpm_x0 / inpainting_ddpm_x0.

Guidance note: the reference's cfdg_ddim_x0 computes its unconditional
branch from the mel of a zero waveform instead of the dropout embedding
(task/diffusion.py:1043 has no `sampling=True` — and it also runs a
redundant third forward, :1035). We treat both as bugs (SURVEY.md §7) and
use the same spec:=-1 unconditional branch as cfdg_ddpm_x0.
"""

from __future__ import annotations

import dataclasses
import functools
import inspect
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..diffusion.forward import extract_x0, q_sample
from ..diffusion.loop import sample_loop, timestep_subsequence
from ..diffusion.samplers import SAMPLER_TABLE, cfg_mix
from ..diffusion.schedule import Schedule, linear_schedule
from ..models import spec_dropout_mask
from ..models.base import DiffRollModel
from .losses import p_losses


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    """Mirrors the reference task yaml group (config/task/*.yaml)."""

    timesteps: int = 200
    # strided few-step sampling: visit only N evenly spaced timesteps of
    # the T-step schedule (DDIM-family recommended; no reference
    # counterpart — the reference always walks all T steps)
    sampling_steps: Optional[int] = None
    beta_start: float = 1e-4
    beta_end: float = 0.02
    loss_type: str = "l2"
    loss_keys: Tuple[str, ...] = ("diffusion_loss",)
    training_mode: str = "x_0"          # 'x_0' | 'epsilon' | 'ex_0'
    sampling_type: str = "cfdg_ddpm_x0"
    w: float = 0.0                      # classifier-free guidance weight
    frame_threshold: float = 0.5
    generation_filter: float = 0.0      # min note duration (s) for MIDI export
    inpainting_t: Optional[Sequence[int]] = None
    inpainting_f: Optional[Sequence[int]] = None
    debug: bool = False                 # conditioner := ground-truth roll
    lr: float = 5e-5
    # sampler fast path: the whole residual stack as ONE fused Pallas
    # kernel per step (ops/gated_stack.py). None = auto (on whenever the
    # model family supports it; Pallas on TPU, fused XLA elsewhere).
    use_fused: Optional[bool] = None
    # run the ENTIRE reverse process as one Pallas kernel with all weights
    # VMEM-resident (ops/sampler_kernel.py) — eliminates the per-step
    # weight re-streaming of the scan path (~63 MB x steps). None = auto
    # (TPU + supported model family + no trajectory requested).
    use_megakernel: Optional[bool] = None
    # training via the custom-VJP fused stack (ops/gated_stack_grad.py —
    # Pallas forward-with-saves + XLA backward). OPT-IN (default: flax
    # path): in isolation the hybrid beats autodiff 12.2 vs 15.7 ms at
    # B=16, but embedded in the full train step it measured SLOWER
    # (24.2 vs 21.3 ms on v5e) — XLA's autodiff schedule overlaps the
    # surrounding step better. Kept for small-batch regimes and as the
    # base for future kernel work; revisit with profiler evidence.
    fused_train: Optional[bool] = None

    def replace(self, **kw) -> "TaskConfig":
        return dataclasses.replace(self, **kw)


class DiffusionTask:
    """Binds a model to the diffusion process. Stateless; params explicit."""

    def __init__(self, model: DiffRollModel, config: TaskConfig = TaskConfig()):
        self.model = model
        self.config = config
        self.schedule: Schedule = linear_schedule(
            config.beta_start, config.beta_end, config.timesteps
        )
        if config.sampling_type not in SAMPLER_TABLE:
            raise KeyError(
                f"unknown sampler {config.sampling_type!r}; "
                f"choices: {sorted(SAMPLER_TABLE)}"
            )

    # ------------------------------------------------------------- training

    def _conditioner(self, batch: Dict[str, jnp.ndarray], roll: jnp.ndarray):
        if self.config.debug or self.model.config.cond_source == "roll":
            return roll
        return self.model.conditioner(
            waveform=batch["audio"],
            inpainting_t=self.config.inpainting_t,
            inpainting_f=self.config.inpainting_f,
        )

    def _forward_train(self, params, x_t, t, cond, uncond_mask):
        """The training-loss forward. `fused_train` is OPT-IN (default
        None = off, the flax per-layer path): the custom-VJP fused stack
        wins in isolation but measured slower embedded in the full step —
        see the TaskConfig.fused_train comment. When set (and the model
        family supports the fused op), the fused route applies the
        'fixed' unconditional substitution (spec := -1
        on dropped rows, reference model/diffwave.py:656-660, 689-693)
        to the raw conditioner — identical to
        DiffRollNet.cond_projections' handling."""
        mc = self.model.config
        from ..ops import supports_fused

        on_tpu = jax.default_backend() == "tpu"
        fused = bool(self.config.fused_train) and supports_fused(mc)
        if not fused:
            return self.model.apply(params, x_t, t, cond, uncond_mask)

        c = cond
        if c is not None:
            if uncond_mask is not None:
                c = jnp.where(uncond_mask[:, None, None], -1.0, c)
            # the conditioner is data-derived (mel front-end has no
            # parameters), so its cotangent is never consumed
            c = jax.lax.stop_gradient(c)
        from ..ops import fused_forward

        return fused_forward(
            params, x_t, t, c, n_layers=mc.residual_layers,
            dilations=mc.dilations(), max_steps=mc.timesteps,
            trainable="pallas_fwd" if on_tpu else "xla", need_dcond=False)

    def loss_fn(
        self,
        params: Any,
        batch: Any,
        key: jax.Array,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]]:
        """One step's total loss + (losses dict, tensors dict).

        `batch` is {'frame': (B,640,88), 'audio': (B,L)} or a pair of such
        dicts for the dual-dataset recipe (reference continue_train_both.py:
        17-25; step() list branch task/diffusion.py:654-659, 704-715).
        Batches may arrive packed for the H2D transfer (int16 audio /
        uint8 rolls, data/pipeline.pack_batch); unpacking is in-jit and a
        no-op for float32.
        """
        from ..data.pipeline import unpack_batch

        batch = unpack_batch(batch)
        cfg = self.config
        dual = isinstance(batch, (tuple, list))
        b1 = batch[0] if dual else batch

        roll = self.model.normalize_roll(b1["frame"])
        bsz = roll.shape[0]
        t_key, n_key, d_key = jax.random.split(key, 3)
        t = jax.random.randint(t_key, (bsz,), 0, cfg.timesteps)
        noise = jax.random.normal(n_key, roll.shape, roll.dtype)
        x_t = q_sample(roll, t, self.schedule, noise)

        cond = self._conditioner(b1, roll)
        p = self.model.config.spec_dropout
        uncond_mask = None
        if train and p > 0 and cond is not None:
            uncond_mask = spec_dropout_mask(d_key, bsz, p)

        pred = self._forward_train(params, x_t, t, cond, uncond_mask)

        losses: Dict[str, jnp.ndarray] = {}
        if cfg.training_mode == "epsilon":
            losses["diffusion_loss"] = p_losses(noise, pred, cfg.loss_type)
            pred_roll = extract_x0(x_t, pred, t, self.schedule)
        elif cfg.training_mode == "x_0":
            losses["diffusion_loss"] = p_losses(roll, pred, cfg.loss_type)
            pred_roll = pred
        elif cfg.training_mode == "ex_0":
            pred_roll = extract_x0(x_t, pred, t, self.schedule)
            losses["diffusion_loss"] = p_losses(roll, pred_roll, cfg.loss_type)
        else:
            raise ValueError(f"training mode {cfg.training_mode!r} not supported")

        tensors = {"pred_roll": pred_roll, "label_roll": roll, "spec": cond}

        if dual:
            # second dataset trains the unconditional branch: same t/noise,
            # spec forced unconditional (reference task/diffusion.py:704-715)
            b2 = batch[1]
            roll2 = self.model.normalize_roll(b2["frame"])
            x_t2 = q_sample(roll2, t, self.schedule, noise)
            cond2 = self._conditioner(b2, roll2)
            all_uncond = jnp.ones((bsz,), bool)
            pred2 = self._forward_train(params, x_t2, t, cond2, all_uncond)
            losses["unconditional_diffusion_loss"] = p_losses(
                roll2, pred2, cfg.loss_type
            )
            tensors.update(
                {"pred_roll2": pred2, "label_roll2": roll2, "spec2": cond2}
            )

        # validation batches of a dual-dataset run are single-dataset: sum
        # only the loss keys that were actually produced
        total = sum(losses[k] for k in cfg.loss_keys if k in losses)
        return total, (losses, tensors)

    # ------------------------------------------------------------- sampling

    def build_conditioner(
        self,
        x_T: jnp.ndarray,
        waveform: Optional[jnp.ndarray] = None,
        roll_cond: Optional[jnp.ndarray] = None,
    ) -> Optional[jnp.ndarray]:
        """The sampler's conditioner, computed ONCE per clip: log-mel with
        inpainting masks applied, the ground-truth roll in debug mode, or
        the trained spec:=-1 unconditional embedding for generation-from-
        noise on a conditional model (NOT a skipped-conditioner forward,
        which the net never saw; reference model/diffwave.py:656-660)."""
        mc = self.model.config
        if mc.unconditional:
            return None
        if self.config.debug or mc.cond_source == "roll":
            return roll_cond
        if waveform is not None:
            return self.model.conditioner(
                waveform=waveform,
                inpainting_t=self.config.inpainting_t,
                inpainting_f=self.config.inpainting_f,
            )
        if mc.cond_source == "spec":
            return jnp.full((x_T.shape[0], x_T.shape[1], mc.n_mels), -1.0)
        return None

    def make_step_fn_from_net(self, net, cond: Optional[jnp.ndarray]):
        """Step closure over an arbitrary `net(x, t_vec, cond) -> pred`
        callable — the shared CFG/generation plumbing used by the fused
        kernel path and by external net implementations (e.g. the
        sequence-parallel forward)."""
        cfg = self.config
        step_fn, _, guided, _ = SAMPLER_TABLE[cfg.sampling_type]
        mc = self.model.config
        generation = cfg.sampling_type.startswith("generation")
        schedule = self.schedule

        if cond is None or mc.unconditional:
            predict = lambda x, t_vec: net(x, t_vec, None)
        elif generation:
            uncond = jnp.full_like(cond, -1.0)
            predict = lambda x, t_vec: net(x, t_vec, uncond)
        elif guided:
            cond2 = jnp.concatenate([cond, jnp.full_like(cond, -1.0)], 0)

            def predict(x, t_vec):
                b = x.shape[0]
                out = net(jnp.concatenate([x, x], 0),
                          jnp.concatenate([t_vec, t_vec], 0), cond2)
                return cfg_mix(out[:b], out[b:], cfg.w)
        else:
            predict = lambda x, t_vec: net(x, t_vec, cond)

        def step(x, t, t_prev, key):
            t_vec = jnp.full((x.shape[0],), t, jnp.int32)
            pred = predict(x, t_vec)
            return step_fn(schedule, x, t, pred, key, t_prev=t_prev)

        return step

    def make_step_fn(self, params: Any, cond: Optional[jnp.ndarray]):
        """Build the `(x, t, key) -> x_{t-1}` closure for `sample_loop`.

        Prediction plumbing per sampler family:
          * plain samplers     — one conditional forward
          * cfdg_* / inpainting — both CFG branches in ONE 2B forward,
            mixed as (1+w) c - w u (reference task/diffusion.py:953)
          * generation         — unconditional forward only (:988)
        """
        cfg = self.config
        step_fn, param_kind, guided, _ = SAMPLER_TABLE[cfg.sampling_type]
        model, schedule = self.model, self.schedule
        mc = model.config
        generation = cfg.sampling_type.startswith("generation")

        from ..ops import fused_forward, stack_weights, supports_fused

        fused = supports_fused(mc) if cfg.use_fused is None else (
            cfg.use_fused and supports_fused(mc))

        if fused:
            # ONE fused Pallas kernel per step for the whole residual stack
            # (ops/gated_stack.py). The 'fixed' unconditional substitution
            # (spec := -1, reference model/diffwave.py:656-660) is applied
            # to the raw conditioner here, once per clip.
            weights = stack_weights(params, mc.residual_layers)

            def net(x, t_vec, c):
                return fused_forward(
                    params, x, t_vec, c, n_layers=mc.residual_layers,
                    dilations=mc.dilations(), max_steps=mc.timesteps,
                    weights=weights)

            return self.make_step_fn_from_net(net, cond)

        if hasattr(type(model.net), "cond_projections"):
            # flax path with per-clip precomputed conditioner projections
            # (the reference re-projects inside every forward,
            # model/diffwave.py:143)
            if cond is None or mc.unconditional:
                proj = None
            elif generation:
                all_mask = jnp.ones((cond.shape[0],), bool)
                proj = model.cond_projections(params, cond, all_mask)
            elif guided:
                proj = model.cfg_cond_projections(params, cond)
            else:
                proj = model.cond_projections(params, cond)

            def predict(x, t_vec):
                if proj is None:
                    return model.apply(params, x, t_vec, None, None)
                if guided:
                    pc, pu = model.apply_cfg(params, x, t_vec, cond_proj=proj)
                    return cfg_mix(pc, pu, cfg.w)
                return model.apply(params, x, t_vec, None, cond_proj=proj)
        else:
            # nets without a separable conditioner projection (the U-Net
            # family) run the reference-style per-step conditioned forward
            def predict(x, t_vec):
                if cond is None or mc.unconditional:
                    return model.apply(params, x, t_vec, None, None)
                if generation:
                    all_mask = jnp.ones((x.shape[0],), bool)
                    return model.apply(params, x, t_vec, cond, all_mask)
                if guided:
                    pc, pu = model.apply_cfg(params, x, t_vec, cond=cond)
                    return cfg_mix(pc, pu, cfg.w)
                return model.apply(params, x, t_vec, cond, None)

        del param_kind  # the model's output already matches the sampler family

        def step(x, t, t_prev, key):
            t_vec = jnp.full((x.shape[0],), t, jnp.int32)
            pred = predict(x, t_vec)
            return step_fn(schedule, x, t, pred, key, t_prev=t_prev)

        return step

    def sample(
        self,
        params: Any,
        x_T: jnp.ndarray,
        key: jax.Array,
        waveform: Optional[jnp.ndarray] = None,
        roll_cond: Optional[jnp.ndarray] = None,
        record_every: Optional[int] = None,
        mesh=None,
    ):
        """Full reverse process. Returns (x_0, trajectory or None).

        The conditioner is computed ONCE here and closed over by the scan
        body — 1 mel evaluation per clip instead of the reference's 400.

        `mesh`: when sampling a batch sharded over a device mesh, pass it
        so the Pallas megakernel runs per-shard under shard_map (XLA has
        no partitioning rule for pallas_call — without the mesh it would
        gather and run the FULL batch replicated on every device). The
        scan path partitions automatically and ignores it.
        """
        cond = self.build_conditioner(x_T, waveform, roll_cond)
        if record_every is None and self._megakernel_applies():
            return self._sample_megakernel(params, x_T, key, cond,
                                           mesh=mesh), None
        step = self.make_step_fn(params, cond)
        return sample_loop(
            step, x_T, self.config.timesteps, key,
            record_every=record_every, steps=self.config.sampling_steps,
        )

    def _megakernel_applies(self) -> bool:
        from ..ops import supports_fused

        cfg = self.config
        if cfg.use_megakernel is not None:
            return bool(cfg.use_megakernel) and supports_fused(self.model.config)
        # use_fused=false is the documented "no Pallas sampling" opt-out;
        # the auto megakernel must respect it too
        return (jax.default_backend() == "tpu"
                and cfg.use_fused is not False
                and supports_fused(self.model.config))

    def _sample_megakernel(self, params, x_T, key, cond, mesh=None):
        """The whole reverse process in ONE Pallas kernel, weights resident
        in VMEM (ops/sampler_kernel.py). Matches the scan path's math AND
        its noise draws (same key split + per-step normal)."""
        import numpy as np

        from ..ops.fused_forward import _embed
        from ..ops.sampler_kernel import (
            fused_sample_pallas,
            head_weights,
            sampler_tables,
        )
        from ..ops import stack_weights

        cfg = self.config
        mc = self.model.config
        _, _, guided, _ = SAMPLER_TABLE[cfg.sampling_type]
        generation = cfg.sampling_type.startswith("generation")

        ts_np = timestep_subsequence(cfg.timesteps, cfg.sampling_steps)
        tsp_np = np.concatenate([ts_np[1:], [-1]]).astype(np.int32)
        tables_np = sampler_tables(self.schedule, cfg.sampling_type,
                                   ts_np, tsp_np)
        tables = jnp.asarray(tables_np)
        # deterministic samplers (every sigma == 0) skip the noise draw
        # entirely — at B=16 x 200 steps the dead tensor would be ~720 MB
        # of HBM the kernel streams just to multiply by zero
        stochastic = bool(np.any(tables_np[:, 2] != 0.0))
        if stochastic:
            keys = jax.random.split(key, len(ts_np))
            noise = jax.vmap(
                lambda k: jax.random.normal(k, x_T.shape, x_T.dtype))(keys)
        else:
            noise = jnp.zeros((1,) + x_T.shape, x_T.dtype)

        w = stack_weights(params, mc.residual_layers)
        head = head_weights(params)
        p = params["params"] if "params" in params else params
        t_emb = _embed(jnp.asarray(ts_np), p["diffusion_embedding"],
                       mc.timesteps)                       # (n, E)
        t_bias = (jnp.einsum("ne,lec->nlc", t_emb, w.wt)
                  + w.bt[None, :, :])                      # (n, L, C)

        if cond is not None and generation:
            cond = jnp.full_like(cond, -1.0)  # reference model/diffwave.py:656

        run = functools.partial(
            fused_sample_pallas, dilations=mc.dilations(),
            guided=bool(guided and cond is not None),
            w_guidance=float(cfg.w), stochastic=stochastic,
            interpret=jax.default_backend() != "tpu",
        )
        data = 1 if mesh is None else int(mesh.shape.get("data", 1))
        if data > 1 and x_T.shape[0] % data == 0:
            try:
                from jax import shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            dp, rep = P("data"), P()
            # jax>=0.8 renamed check_rep -> check_vma; disabled either way
            # (the kernel's replicated operands need no varying-axis check)
            kw = ({"check_vma": False}
                  if "check_vma" in inspect.signature(shard_map).parameters
                  else {"check_rep": False})
            run = shard_map(
                run, mesh=mesh,
                in_specs=(dp, P(None, "data"), rep, rep, rep, rep,
                          rep if cond is None else dp),
                out_specs=dp, **kw,
            )
        return run(x_T, noise, t_bias, tables, w, head, cond)

    def sample_jit(self, donate: bool = True, mesh=None):
        """A jitted (params, x_T, key, waveform) -> x_0 transcription fn.
        Pass `mesh` when batches are sharded over one (see `sample`)."""
        f = functools.partial(self.sample, record_every=None, mesh=mesh)

        def run(params, x_T, key, waveform):
            x0, _ = f(params, x_T, key, waveform=waveform)
            return x0

        return jax.jit(run, donate_argnums=(1,) if donate else ())
