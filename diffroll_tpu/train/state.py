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
    HBM traffic at the 7-access minimum (measured ~1 ms of the B=16 step).

    `moments_dtype='bfloat16'` additionally stores mu/nu in bf16 (written
    back with stochastic rounding, arithmetic still f32) — halves the
    moment traffic of the update, the dominant optimizer cost at flagship
    size. Off by default; flip only with a measured end-to-end win
    (CLAUDE.md rule)."""

    init: Callable
    update: Callable
    lr: float
    b1: float
    b2: float
    eps: float
    moments_dtype: Any = None


def make_optimizer(lr: float, moments_dtype: Any = None) -> AdamTx:
    """Adam with the reference's settings (torch.optim.Adam(lr), reference
    task/diffusion.py:1057-1067: default betas/eps, no weight decay)."""
    import jax.numpy as jnp

    b1, b2, eps = 0.9, 0.999, 1e-8
    base = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    init = base.init
    if moments_dtype is not None:
        md = jnp.dtype(moments_dtype)

        def init(params, _base=base.init, _md=md):  # noqa: F811
            s = _base(params)
            adam = s[0]._replace(
                mu=jax.tree_util.tree_map(lambda x: x.astype(_md), s[0].mu),
                nu=jax.tree_util.tree_map(lambda x: x.astype(_md), s[0].nu))
            return (adam,) + tuple(s[1:])

    return AdamTx(init=init, update=base.update,
                  lr=lr, b1=b1, b2=b2, eps=eps, moments_dtype=moments_dtype)


def _stochastic_round(x: jax.Array, dtype, key: jax.Array) -> jax.Array:
    """f32 -> bf16 with stochastic rounding: add uniform bits below the
    bf16 mantissa cut, then truncate. Unbiased (E[round(x)] == x), unlike
    round-to-nearest which systematically loses small moment updates once
    |update| < ulp(moment)/2 — the classic bf16-Adam stall."""
    import jax.numpy as jnp

    assert jnp.dtype(dtype) == jnp.bfloat16, "stochastic rounding: bf16 only"
    bits = jax.random.bits(key, x.shape, dtype=jnp.uint16).astype(jnp.uint32)
    xi = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    xr = (xi + bits) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(
        xr, jnp.float32).astype(jnp.bfloat16)


def fused_adam_apply(tx: AdamTx, params: Any, grads: Any, opt_state: Any):
    """One fused elementwise pass: (params, mu, nu) -> updated, bitwise
    matching optax.adam's update + apply_updates composition (same moment
    recursions, bias corrections m/(1-b1^t), v/(1-b2^t), eps OUTSIDE the
    sqrt, then p - lr * m_hat/(sqrt(v_hat)+eps)).

    With tx.moments_dtype='bfloat16' the stored moments are upcast to f32
    for the recursion and written back with stochastic rounding (keyed
    deterministically off the step count, so the update stays a pure
    function of (state, grads))."""
    import jax.numpy as jnp

    adam_s = opt_state[0]
    count = optax.safe_increment(adam_s.count)
    cf = count.astype(jnp.float32)
    c1 = 1.0 - jnp.power(tx.b1, cf)
    c2 = 1.0 - jnp.power(tx.b2, cf)
    packed = tx.moments_dtype is not None

    def upd(p, g, m, v, key=None):
        g = g.astype(jnp.float32) if packed else g.astype(m.dtype)
        mf = m.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        m2 = tx.b1 * mf + (1.0 - tx.b1) * g
        v2 = tx.b2 * vf + (1.0 - tx.b2) * (g * g)
        p2 = p - tx.lr * (m2 / c1) / (jnp.sqrt(v2 / c2) + tx.eps)
        if packed:
            km, kv = jax.random.split(key)
            m2 = _stochastic_round(m2, tx.moments_dtype, km)
            v2 = _stochastic_round(v2, tx.moments_dtype, kv)
        return p2.astype(p.dtype), m2.astype(m.dtype), v2.astype(v.dtype)

    if packed:
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(
            jax.random.fold_in(jax.random.key(0x5ADA), count), len(leaves))
        key_tree = jax.tree_util.tree_unflatten(treedef, list(keys))
        triples = jax.tree_util.tree_map(
            upd, params, grads, adam_s.mu, adam_s.nu, key_tree)
    else:
        triples = jax.tree_util.tree_map(
            upd, params, grads, adam_s.mu, adam_s.nu)
    pick = lambda i: jax.tree_util.tree_map(
        lambda t: t[i], triples, is_leaf=lambda x: isinstance(x, tuple))
    new_params, mu, nu = pick(0), pick(1), pick(2)
    new_opt = (adam_s._replace(count=count, mu=mu, nu=nu),) + tuple(
        opt_state[1:])
    return new_params, new_opt
