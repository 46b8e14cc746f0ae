"""Host-side input pipeline: batching, shuffling, background prefetch.

TPU-native replacement for torch DataLoader + Lightning's
DistributedSampler (reference train_spec_roll.py:24-26,
config/spec_roll.yaml:15-32): batches are assembled on host with a
background thread pool, optionally sharded across processes by
`jax.process_index()` (each host reads its own slice), and handed to the
device via `shard_batch` at the training loop.
"""

from __future__ import annotations

import concurrent.futures as cf
import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


def collate(items: Sequence[Any]) -> Any:
    """Stack dict-of-arrays items (tuples/lists are collated per element)."""
    first = items[0]
    if isinstance(first, dict):
        out = {}
        for k, v in first.items():
            if isinstance(v, np.ndarray) or np.isscalar(v):
                out[k] = np.stack([np.asarray(it[k]) for it in items])
            else:
                out[k] = [it[k] for it in items]  # e.g. file names
        return out
    if isinstance(first, (tuple, list)):
        return type(first)(
            collate([it[i] for it in items]) for i in range(len(first))
        )
    return np.stack([np.asarray(it) for it in items])


def device_prefetch(iterator, mesh=None, size: int = 2):
    """Overlap host->device transfer with device compute: keep `size`
    batches in flight on the accelerator (sharded over the mesh's data
    axis when given). The torch `pin_memory` + async-H2D equivalent for
    the jit train loop."""
    import collections

    import jax

    def put(batch):
        if mesh is not None:
            from ..parallel.mesh import shard_batch

            return shard_batch(mesh, batch)
        return jax.device_put(batch)

    buf = collections.deque()
    for batch in iterator:
        buf.append(put(batch))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


class DataLoader:
    """Minimal epoch iterator: shuffle, batch, parallel fetch, prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self._epoch = 0
        self._seed = seed

    def __len__(self) -> int:
        n = len(self._indices_for_epoch(0))
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices_for_epoch(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self._seed + epoch)
            rng.shuffle(idx)
        # multi-host sharding: each process reads a contiguous stripe
        return idx[self.process_index :: self.process_count]

    def __iter__(self) -> Iterator[Any]:
        idx = self._indices_for_epoch(self._epoch)
        self._epoch += 1
        batches: List[np.ndarray] = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            # one pool per epoch, not per batch
            try:
                with cf.ThreadPoolExecutor(self.num_workers) as pool:
                    for b in batches:
                        items = list(pool.map(self.dataset.__getitem__, b))
                        q.put(collate(items))
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
