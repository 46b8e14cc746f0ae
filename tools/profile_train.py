"""Train-step surgery: where do the milliseconds go?

Times component slices of the B=16 flagship train step inside a lax.scan
(the chip sits behind a ~25 ms dispatch tunnel; naive timing measures the
tunnel). Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python -u tools/profile_train.py [dtypes=bfloat16,float32]

Each row is an *independent* jitted scan, so rows don't sum exactly (XLA
fuses differently per program) — read them as bounds, not a partition.

CRITICAL lesson from the first run of this tool: any loop-invariant input
(a closed-over batch) gets HOISTED out of the scan by XLA — the mel
front-end vanished from the "full step" rows entirely. Every row below
streams per-step DISTINCT batches through scan xs, like real training.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from diffroll_tpu import models
from diffroll_tpu.tasks import DiffusionTask, TaskConfig
from diffroll_tpu.train import TrainState, make_optimizer
from diffroll_tpu.train.state import AdamTx, fused_adam_apply
from diffroll_tpu.diffusion.forward import q_sample

B, K = 16, 20
ARGS = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)


def timeit(fn, iters=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / iters


def scan_time(body, carry, xs, label, results, iters=3):
    """Time K chained `body(carry, xs_slice) -> (carry, out)` steps."""
    @jax.jit
    def many(carry, xs):
        return jax.lax.scan(body, carry, xs)

    dt = timeit(lambda: many(carry, xs), iters=iters) / K
    results[label] = round(dt * 1e3, 3)
    print(f"{label:42s} {dt * 1e3:8.3f} ms")
    return dt


def main():
    import os
    from diffroll_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()
    results = {}
    dtypes = ARGS.get("dtypes", "bfloat16").split(",")
    for dtype in dtypes:
        print(f"=== dtype={dtype} ===")
        model = models.build("ClassifierFreeDiffRoll", dtype=dtype)
        task = DiffusionTask(model, TaskConfig(timesteps=200))
        params = model.init(jax.random.key(0))
        tx = make_optimizer(5e-5)
        state = TrainState.create(params, tx)
        frames = model.config.frames
        sfx = f"[{dtype}]"

        batches = {
            "frame": (jax.random.uniform(jax.random.key(1), (K, B, frames, 88))
                      > 0.9).astype(jnp.float32),
            "audio": jax.random.normal(jax.random.key(2),
                                       (K, B, frames * 512)),
        }
        keys = jax.random.split(jax.random.key(3), K)
        xs = (batches, keys)
        roll0 = model.normalize_roll(batches["frame"][0])
        cond_fixed = jax.block_until_ready(
            jax.jit(lambda a: model.conditioner(waveform=a))(
                batches["audio"][0]))

        def opt_apply(state, grads):
            if isinstance(tx, AdamTx):
                new_p, opt = fused_adam_apply(tx, state.params, grads,
                                              state.opt_state)
            else:
                import optax

                updates, opt = tx.update(grads, state.opt_state, state.params)
                new_p = optax.apply_updates(state.params, updates)
            return TrainState(step=state.step + 1, params=new_p,
                              opt_state=opt)

        # --- 1. full step (loss_fn incl. mel + grad + adam) ----------------
        def full(state, x):
            batch, key = x
            (_, (losses, _)), grads = jax.value_and_grad(
                lambda p: task.loss_fn(p, batch, key, True), has_aux=True
            )(state.params)
            return opt_apply(state, grads), losses["diffusion_loss"]

        scan_time(full, state, xs, f"full_step{sfx}", results)

        # --- 2. forward only (loss_fn, no grad) ----------------------------
        def fwd(carry, x):
            batch, key = x
            loss, _ = task.loss_fn(params, batch, key, True)
            return carry + loss * 0, loss

        scan_time(fwd, jnp.zeros(()), xs, f"fwd_only{sfx}", results)

        # --- 3. grad, no optimizer ----------------------------------------
        def gradstep(carry, x):
            batch, key = x
            (loss, _), grads = jax.value_and_grad(
                lambda p: task.loss_fn(p, batch, key, True), has_aux=True
            )(params)
            gsum = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                       for g in jax.tree_util.tree_leaves(grads))
            return carry + gsum * 0, loss

        scan_time(gradstep, jnp.zeros(()), xs, f"grad_no_opt{sfx}", results)

        # --- 4. mel conditioner alone (per-step distinct audio) -----------
        def melonly(carry, x):
            batch, _ = x
            c = model.conditioner(waveform=batch["audio"])
            return carry + 0 * jnp.mean(c), jnp.mean(c)

        scan_time(melonly, jnp.zeros(()), xs, f"mel_conditioner{sfx}", results)

        # --- 5. full step with mel hoisted out (precomputed cond) ---------
        p_drop = model.config.spec_dropout

        def loss_nomel(p, batch, key):
            t_key, n_key, d_key = jax.random.split(key, 3)
            roll = model.normalize_roll(batch["frame"])
            t = jax.random.randint(t_key, (B,), 0, 200)
            noise = jax.random.normal(n_key, roll.shape, roll.dtype)
            x_t = q_sample(roll, t, task.schedule, noise)
            um = models.spec_dropout_mask(d_key, B, p_drop)
            pred = model.apply(p, x_t, t, cond_fixed, um)
            return jnp.mean((roll - pred) ** 2)

        def full_nomel(state, x):
            batch, key = x
            loss, grads = jax.value_and_grad(loss_nomel)(state.params,
                                                         batch, key)
            return opt_apply(state, grads), loss

        scan_time(full_nomel, state, xs, f"full_step_nomel{sfx}", results)

        # --- 6. net fwd+bwd only (per-step distinct x_t; no mel/RNG) ------
        x_ts = jax.random.normal(jax.random.key(7), (K,) + roll0.shape)
        t0 = jnp.full((B,), 100, jnp.int32)
        um0 = jnp.zeros((B,), bool)

        def netgrad(carry, x_t):
            def lf(p):
                pred = model.apply(p, x_t, t0, cond_fixed, um0)
                return jnp.mean((roll0 - pred) ** 2)
            loss, grads = jax.value_and_grad(lf)(params)
            gsum = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                       for g in jax.tree_util.tree_leaves(grads))
            return carry + 0 * gsum, loss

        scan_time(netgrad, jnp.zeros(()), x_ts, f"net_fwd_bwd{sfx}", results)

        # --- 7. net fwd only ----------------------------------------------
        def netfwd(carry, x_t):
            pred = model.apply(params, x_t, t0, cond_fixed, um0)
            return carry + 0 * jnp.mean(pred), jnp.mean(pred)

        scan_time(netfwd, jnp.zeros(()), x_ts, f"net_fwd{sfx}", results)

        # --- 8. optimizer update alone (per-step distinct grads) ----------
        grads0 = jax.jit(jax.grad(
            lambda p, b, k: task.loss_fn(p, b, k, True)[0]))(
                params, {k: v[0] for k, v in batches.items()},
                jax.random.key(5))
        grads0 = jax.block_until_ready(grads0)

        def optonly(state, key):
            # cheap per-step variation (scalar broadcast) defeats hoisting
            # without materializing K gradient trees
            eps = jax.random.uniform(key, ())
            g = jax.tree_util.tree_map(lambda x: x * (1.0 + 0 * eps) + eps * 0,
                                       grads0)
            return opt_apply(state, g), state.step

        scan_time(optonly, state, keys, f"adam_update{sfx}", results)

        # --- 9. RNG + q_sample alone --------------------------------------
        def rngonly(carry, x):
            batch, key = x
            t_key, n_key, d_key = jax.random.split(key, 3)
            roll = model.normalize_roll(batch["frame"])
            t = jax.random.randint(t_key, (B,), 0, 200)
            noise = jax.random.normal(n_key, roll.shape, roll.dtype)
            x_t = q_sample(roll, t, task.schedule, noise)
            um = models.spec_dropout_mask(d_key, B, p_drop)
            return carry + 0 * jnp.mean(x_t), jnp.mean(x_t) + um.sum()

        scan_time(rngonly, jnp.zeros(()), xs, f"rng_qsample{sfx}", results)

        # --- 10. overhead candidates (VERDICT r3 #4): bf16 Adam moments
        # with stochastic rounding (halves moment HBM traffic) and the rbg
        # PRNG for the training noise stream — each alone and combined,
        # plus their isolated slices, so the A/B is one command ----------
        tx16 = make_optimizer(5e-5, moments_dtype="bfloat16")
        state16 = TrainState.create(params, tx16)

        def opt_apply16(state, grads):
            new_p, opt = fused_adam_apply(tx16, state.params, grads,
                                          state.opt_state)
            return TrainState(step=state.step + 1, params=new_p,
                              opt_state=opt)

        def full_packed(state, x):
            batch, key = x
            (_, (losses, _)), grads = jax.value_and_grad(
                lambda p: task.loss_fn(p, batch, key, True), has_aux=True
            )(state.params)
            return opt_apply16(state, grads), losses["diffusion_loss"]

        scan_time(full_packed, state16, xs,
                  f"full_step_packed_moments{sfx}", results)

        keys_rbg = jax.random.split(jax.random.key(3, impl="rbg"), K)
        xs_rbg = (batches, keys_rbg)
        scan_time(full, state, xs_rbg, f"full_step_rbg{sfx}", results)
        scan_time(full_packed, state16, xs_rbg,
                  f"full_step_packed_rbg{sfx}", results)

        def optonly16(state, key):
            eps = jax.random.uniform(key, ())
            g = jax.tree_util.tree_map(lambda x: x * (1.0 + 0 * eps) + eps * 0,
                                       grads0)
            return opt_apply16(state, g), state.step

        scan_time(optonly16, state16, keys,
                  f"adam_update_packed{sfx}", results)
        scan_time(rngonly, jnp.zeros(()), xs_rbg,
                  f"rng_qsample_rbg{sfx}", results)

    # --- mel variants (per-step distinct audio) ----------------------------
    print("=== mel variants ===")
    from diffroll_tpu.dsp.mel import MelSpectrogram, MelConfig, log_mel

    audios = jax.random.normal(jax.random.key(2), (K, B, 640 * 512))
    variants = [("fft", "highest"), ("matmul", "highest"),
                ("conv", "highest"), ("conv", "default")]
    for method, prec in variants:
        m = MelSpectrogram(MelConfig(method=method, precision=prec))

        def melv(carry, audio):
            s = log_mel(m(audio))
            return carry + 0 * jnp.mean(s), jnp.mean(s)

        scan_time(melv, jnp.zeros(()), audios, f"mel_{method}_{prec}",
                  results)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
