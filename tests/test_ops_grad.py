"""Tests for the trainable fused gated stack (ops/gated_stack_grad.py,
ops/gated_stack_train.py): the custom VJP against jax autodiff of the
plain XLA stack, the Pallas kernels in interpret mode against the XLA
reference, and the task-level fused training path against the flax path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffroll_tpu.ops.gated_stack import GatedStackWeights, gated_stack_xla
from diffroll_tpu.ops.gated_stack_grad import (
    _bwd_xla,
    _fwd_saves_xla,
    gated_stack_trainable,
)

L, K, C, M0, B, T = 4, 3, 16, 10, 4, 32
DIL = (1, 2, 4, 1)


def _setup(conditional=True, seed=0):
    rng = np.random.RandomState(seed)

    def arr(*s):
        return jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)

    w = GatedStackWeights(
        wd=arr(L, K, C, 2 * C),
        wc=arr(L, 128, 2 * C) if conditional else None,
        wo=arr(L, C, 2 * C),
        b=arr(L, 2 * C),
        bc=arr(L, 2 * C) if conditional else None,
        bo=arr(L, 2 * C),
        wt=arr(L, 8, C),
        bt=arr(L, C),
    )
    return (arr(B, T, C), arr(L, B, C),
            arr(B, T, M0) if conditional else None, w, arr(B, T, C))


def _grads(fn, x, tb, cond, w):
    if cond is None:
        g = jax.grad(lambda x, tb, w: fn(x, tb, None, w),
                     argnums=(0, 1, 2))(x, tb, w)
        return g[0], g[1], None, g[2]
    return jax.grad(fn, argnums=(0, 1, 2, 3))(x, tb, cond, w)


def _assert_tree_close(ga, gb, tol):
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        denom = float(jnp.abs(a).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) / denom < tol


@pytest.mark.parametrize("conditional", [True, False])
def test_custom_vjp_matches_autodiff(conditional):
    x, tb, cond, w, cot = _setup(conditional)

    def loss_ref(x, tb, cond, w):
        return jnp.sum(gated_stack_xla(x, tb, cond, w, DIL) * cot)

    def loss_new(x, tb, cond, w):
        return jnp.sum(
            gated_stack_trainable(DIL, "xla", True, x, tb, cond, w) * cot)

    _assert_tree_close(_grads(loss_ref, x, tb, cond, w),
                       _grads(loss_new, x, tb, cond, w), 1e-4)


def test_need_dcond_false_returns_zero_cond_grad():
    x, tb, cond, w, cot = _setup(True)

    def loss(x, tb, cond, w):
        return jnp.sum(
            gated_stack_trainable(DIL, "xla", False, x, tb, cond, w) * cot)

    gx, gtb, gcond, gw = jax.grad(loss, argnums=(0, 1, 2, 3))(x, tb, cond, w)
    assert float(jnp.abs(gcond).max()) == 0.0
    # all other grads unaffected
    def loss_full(x, tb, cond, w):
        return jnp.sum(
            gated_stack_trainable(DIL, "xla", True, x, tb, cond, w) * cot)
    fx, ftb, _, fw = jax.grad(loss_full, argnums=(0, 1, 2, 3))(x, tb, cond, w)
    _assert_tree_close((gx, gtb, gw), (fx, ftb, fw), 1e-5)


@pytest.mark.parametrize("conditional", [True, False])
def test_pallas_train_kernels_interpret_parity(conditional):
    """Forward-with-saves and backward Pallas kernels vs the XLA reference
    (interpret mode; bf16 saves => loose tolerance)."""
    from diffroll_tpu.ops.gated_stack_train import (
        gated_stack_bwd_pallas,
        gated_stack_fwd_pallas,
    )

    x, tb, cond, w, cot = _setup(conditional)
    skip_x, xs_x, a_x = _fwd_saves_xla(x, tb, cond, w, DIL)
    skip_p, xs_p, a_p = gated_stack_fwd_pallas(x, tb, cond, w, DIL,
                                               interpret=True)
    assert float(jnp.abs(skip_x - skip_p).max()) < 0.05

    gx = _bwd_xla(DIL, (x.shape, tb, cond, w, xs_x, a_x), cot)
    gp = gated_stack_bwd_pallas(DIL, (x.shape, tb, cond, w, xs_p, a_p), cot,
                                interpret=True)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        denom = float(jnp.abs(a).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) / denom < 0.05


def test_task_fused_train_loss_matches_flax():
    """loss_fn grads with fused_train=True ('xla' impl off-TPU) vs the
    flax per-layer path — same math, different op schedule."""
    from diffroll_tpu import models
    from diffroll_tpu.tasks import DiffusionTask, TaskConfig

    model = models.build(
        "ClassifierFreeDiffRoll", residual_channels=16, residual_layers=3,
        frames=32, timesteps=10, spec_dropout=0.5,
    )
    params = model.init(jax.random.key(0))
    batch = {
        "frame": (jax.random.uniform(jax.random.key(1), (4, 32, 88)) > 0.9
                  ).astype(jnp.float32),
        "audio": jax.random.normal(jax.random.key(2), (4, 32 * 512)),
    }

    def grads(fused):
        task = DiffusionTask(model, TaskConfig(
            timesteps=10, training_mode="x_0", fused_train=fused))
        lf = lambda p: task.loss_fn(p, batch, jax.random.key(3), True)[0]
        return task.loss_fn(params, batch, jax.random.key(3), True)[0], \
            jax.grad(lf)(params)

    loss_flax, g_flax = grads(False)
    loss_fused, g_fused = grads(True)
    assert abs(float(loss_flax) - float(loss_fused)) < 1e-4
    for a, b in zip(jax.tree.leaves(g_flax), jax.tree.leaves(g_fused)):
        denom = float(jnp.abs(a).max()) + 1e-5
        assert float(jnp.abs(a - b).max()) / denom < 2e-3


def test_fused_train_dual_dataset_branch():
    """The dual-dataset (always-unconditional second loss) also routes
    through the fused path and matches flax."""
    from diffroll_tpu import models
    from diffroll_tpu.tasks import DiffusionTask, TaskConfig

    model = models.build(
        "ClassifierFreeDiffRoll", residual_channels=16, residual_layers=2,
        frames=32, timesteps=10, spec_dropout=0.1,
    )
    params = model.init(jax.random.key(0))

    def mk(seed):
        return {
            "frame": (jax.random.uniform(jax.random.key(seed), (4, 32, 88))
                      > 0.9).astype(jnp.float32),
            "audio": jax.random.normal(jax.random.key(seed + 1), (4, 32 * 512)),
        }

    batch = [mk(1), mk(10)]
    cfg = TaskConfig(timesteps=10, training_mode="x_0",
                     loss_keys=("diffusion_loss",
                                "unconditional_diffusion_loss"))
    for fused in (False, True):
        task = DiffusionTask(model, cfg.replace(fused_train=fused))
        total, (losses, _) = task.loss_fn(params, batch, jax.random.key(3))
        assert "unconditional_diffusion_loss" in losses
        if fused:
            assert abs(float(total) - ref_total) < 1e-4
        else:
            ref_total = float(total)
