"""Train state: params + optimizer state + step counter (flax.struct)."""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation) -> "TrainState":
        import jax.numpy as jnp

        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


class AdamTx(NamedTuple):
    """optax-compatible Adam handle (init/update duck-type
    GradientTransformation; opt_state IS optax.adam's, so checkpoints are
    interchangeable) that additionally carries its hyperparameters, letting
    the train step run the FUSED one-tree_map update (`fused_adam_apply`)
    instead of optax's update-then-apply chain — the chain materializes a
    full f32 updates tree (~160 MB at flagship size) between the two
    calls; fusing new p/mu/nu into one elementwise kernel per leaf keeps
    HBM traffic at the 7-access minimum (measured ~1 ms of the B=16 step)."""

    init: Callable
    update: Callable
    lr: float
    b1: float
    b2: float
    eps: float


def make_optimizer(lr: float) -> AdamTx:
    """Adam with the reference's settings (torch.optim.Adam(lr), reference
    task/diffusion.py:1057-1067: default betas/eps, no weight decay)."""
    b1, b2, eps = 0.9, 0.999, 1e-8
    base = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    return AdamTx(init=base.init, update=base.update,
                  lr=lr, b1=b1, b2=b2, eps=eps)


def fused_adam_apply(tx: AdamTx, params: Any, grads: Any, opt_state: Any):
    """One fused elementwise pass: (params, mu, nu) -> updated, bitwise
    matching optax.adam's update + apply_updates composition (same moment
    recursions, bias corrections m/(1-b1^t), v/(1-b2^t), eps OUTSIDE the
    sqrt, then p - lr * m_hat/(sqrt(v_hat)+eps))."""
    import jax.numpy as jnp

    adam_s = opt_state[0]
    count = optax.safe_increment(adam_s.count)
    cf = count.astype(jnp.float32)
    c1 = 1.0 - jnp.power(tx.b1, cf)
    c2 = 1.0 - jnp.power(tx.b2, cf)

    def upd(p, g, m, v):
        g = g.astype(m.dtype)
        m2 = tx.b1 * m + (1.0 - tx.b1) * g
        v2 = tx.b2 * v + (1.0 - tx.b2) * (g * g)
        p2 = p - tx.lr * (m2 / c1) / (jnp.sqrt(v2 / c2) + tx.eps)
        return p2.astype(p.dtype), m2, v2

    triples = jax.tree_util.tree_map(upd, params, grads, adam_s.mu, adam_s.nu)
    pick = lambda i: jax.tree_util.tree_map(
        lambda t: t[i], triples, is_leaf=lambda x: isinstance(x, tuple))
    new_params, mu, nu = pick(0), pick(1), pick(2)
    new_opt = (adam_s._replace(count=count, mu=mu, nu=nu),) + tuple(
        opt_state[1:])
    return new_params, new_opt
