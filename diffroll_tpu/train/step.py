"""The sharded training step.

One jitted function over an explicit `Mesh`: batch sharded over 'data',
params/opt-state sharded per `param_sharding` (replicated for pure DP).
Gradient all-reduce over ICI is emitted by XLA from the sharding
annotations — the TPU-native equivalent of the reference's hidden NCCL DDP
(reference train_spec_roll.py:54; SURVEY.md §5 'distributed communication
backend').
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import batch_sharding, param_sharding
from .state import TrainState

# loss_fn(params, batch, key, train) -> (total, (losses, tensors))
LossFn = Callable[..., Tuple[jax.Array, Tuple[Dict, Dict]]]


def make_train_step(
    loss_fn: LossFn,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    state_example: Optional[TrainState] = None,
    donate_state: bool = True,
):
    """Build a jitted `(state, batch, key) -> (state, losses)` step.

    With a mesh, in/out shardings are pinned so the compiler cannot silently
    replicate the batch; without one, it is a plain single-device jit.
    """

    from .state import AdamTx, fused_adam_apply

    def step(state: TrainState, batch: Any, key: jax.Array):
        (_, (losses, _)), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, key, True), has_aux=True
        )(state.params)
        if isinstance(tx, AdamTx):
            # fused p/mu/nu update — no materialized updates tree (state.py)
            params, opt_state = fused_adam_apply(
                tx, state.params, grads, state.opt_state)
        else:
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            losses,
        )

    donate = (0,) if donate_state else ()
    if mesh is None:
        return jax.jit(step, donate_argnums=donate)

    if state_example is None:
        raise ValueError("state_example required to derive shardings for a mesh")
    state_shardings = TrainState(
        step=NamedSharding(mesh, P()),
        params=param_sharding(mesh, state_example.params),
        opt_state=param_sharding(mesh, state_example.opt_state),
    )
    # a single sharding acts as a pytree prefix: every batch leaf over 'data'
    bspec = batch_sharding(mesh)

    return jax.jit(
        step,
        in_shardings=(state_shardings, bspec, NamedSharding(mesh, P())),
        out_shardings=(state_shardings, NamedSharding(mesh, P())),
        donate_argnums=donate,
    )


def make_eval_step(loss_fn: LossFn):
    """Jitted `(params, batch, key) -> losses` without gradients."""

    def step(params, batch, key):
        _, (losses, _) = loss_fn(params, batch, key, False)
        return losses

    return jax.jit(step)
