"""Device-mesh parallelism (the reference's only strategy is DDP via
Lightning's `gpus` flag, reference README.md:43; here the mesh is a
first-class, user-visible object — SURVEY.md §2c, §5)."""

from .context import sample_sequence_parallel, sequence_parallel_forward
from .mesh import (
    batch_sharding,
    make_mesh,
    param_sharding,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "make_mesh",
    "sequence_parallel_forward",
    "sample_sequence_parallel",
    "batch_sharding",
    "param_sharding",
    "replicated",
    "shard_batch",
    "shard_params",
]
