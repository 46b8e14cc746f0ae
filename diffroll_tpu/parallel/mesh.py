"""Mesh construction and sharding rules.

Parallelism design (SURVEY.md §2c): the workload is a small fully-conv
model over fixed 640-frame windows — data parallelism over ICI carries it.
The mesh still exposes a `model` axis so large configs can shard conv
channels (tensor parallelism) without API change: parameters whose trailing
(output-channel) dimension is divisible by the axis size are sharded over
it, and XLA/GSPMD inserts the collectives.

Replaces: NCCL all-reduce hidden inside PyTorch-Lightning DDP (reference
train_spec_roll.py:54, config/spec_roll.yaml:36). Here gradient reduction
is emitted by XLA from sharding annotations on a jitted step — there is no
hand-written communication layer, but the mesh is explicit and public.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults to all devices on the data axis. On multi-host TPU slices the
    device order from `jax.devices()` already follows the ICI topology, so
    a reshape gives contiguous model groups within hosts.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: sharded over 'data' on the leading axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params: Any) -> Any:
    """Sharding pytree for params: tensor-parallel over 'model' where the
    trailing (output-feature) dim divides evenly, else replicated.

    With model=1 this is pure DP (everything replicated), matching the
    reference's semantics.
    """
    m = mesh.shape["model"]

    def rule(p):
        if m > 1 and hasattr(p, "ndim") and p.ndim >= 1 and p.shape[-1] % m == 0:
            spec = [None] * (p.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place params on the mesh according to `param_sharding`."""
    return jax.device_put(params, param_sharding(mesh, params))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch onto the mesh, sharded over 'data'.

    On multi-host runs each process holds its OWN stripe of the global
    batch (DataLoader's process_index slicing), so the global array must be
    assembled from per-process shards — a bare device_put would misread the
    local stripe as the full global array.

    A TAIL batch whose leading dim does not divide the data axis (val/eval
    loaders keep partial last batches; e.g. 1 leftover clip on a data=2
    mesh) is placed REPLICATED instead — numerically identical, just
    unsharded, and XLA reshards at dispatch. Single-process only:
    multi-host tails cannot be assembled without cross-host exchange, so
    size loaders to the data axis there (DataLoader drops to per-process
    stripes already)."""
    s = batch_sharding(mesh)
    data = int(mesh.shape.get("data", 1))
    divisible = all(
        getattr(x, "ndim", 0) == 0 or x.shape[0] % data == 0
        for x in jax.tree_util.tree_leaves(batch))
    if jax.process_count() > 1:
        put = lambda x: jax.make_array_from_process_local_data(s, x)
    elif divisible:
        put = lambda x: jax.device_put(x, s)
    else:
        rep = NamedSharding(mesh, P())
        put = lambda x: jax.device_put(x, rep)
    return jax.tree_util.tree_map(put, batch)
