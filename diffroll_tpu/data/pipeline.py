"""Host-side input pipeline: batching, shuffling, background prefetch.

TPU-native replacement for torch DataLoader + Lightning's
DistributedSampler (reference train_spec_roll.py:24-26,
config/spec_roll.yaml:15-32): batches are assembled on host with a
background thread pool, optionally sharded across processes by
`jax.process_index()` (each host reads its own slice), and handed to the
device via `shard_batch` at the training loop.
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
import itertools
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


def pack_batch(batch: Any) -> Any:
    """Shrink a host batch for the H2D transfer, losslessly w.r.t. the
    corpus sources: float32 audio -> int16 (16-bit PCM is the decode
    precision, io/wav._pcm_to_float divides by 32768, so round(x*32768)
    inverts it bit-exactly for unresampled clips), binary {0,1} float32
    rolls -> uint8. On a bandwidth-limited host link this cuts the
    dominant per-step transfer ~2.2x (B=16 full size: 25 MB -> 11.4 MB).
    `unpack_batch` (in-jit) restores float32; non-float leaves pass
    through untouched."""
    if isinstance(batch, (tuple, list)):
        return type(batch)(pack_batch(b) for b in batch)
    out = {}
    for k, v in batch.items():
        if not isinstance(v, np.ndarray) or v.dtype != np.float32:
            out[k] = v
        elif k == "audio":
            out[k] = np.clip(np.rint(v * 32768.0), -32768,
                             32767).astype(np.int16)
        elif k in ("frame", "onset"):  # binary rolls
            out[k] = v.astype(np.uint8)
        else:
            out[k] = v
    return out


def unpack_batch(batch: Any) -> Any:
    """In-jit inverse of `pack_batch`: int16 audio -> float32/32768,
    uint8 rolls -> float32. No-op on float32 batches, so every loss_fn
    caller can apply it unconditionally."""
    import jax.numpy as jnp

    if isinstance(batch, (tuple, list)):
        return type(batch)(unpack_batch(b) for b in batch)
    if not isinstance(batch, dict):
        return batch
    out = {}
    for k, v in batch.items():
        dt = getattr(v, "dtype", None)
        if dt == jnp.int16:
            out[k] = v.astype(jnp.float32) * (1.0 / 32768.0)
        elif dt == jnp.uint8:
            out[k] = v.astype(jnp.float32)
        else:
            out[k] = v
    return out


def device_prefetch(iterator, mesh=None, size: int = 2,
                    pack: bool = False):
    """Overlap host->device transfer with device compute: keep `size`
    batches in flight on the accelerator (sharded over the mesh's data
    axis when given). The torch `pin_memory` + async-H2D equivalent for
    the jit train loop. `pack=True` sends batches through `pack_batch`
    (int16 audio / uint8 rolls) — the consumer's loss_fn unpacks in-jit."""
    import collections

    import jax

    def put(batch):
        if pack:
            batch = pack_batch(batch)
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
        self._executor: Optional[cf.ThreadPoolExecutor] = None

    def __del__(self):
        ex = getattr(self, "_executor", None)
        if ex is not None:
            try:
                ex.shutdown(wait=False, cancel_futures=True)
            except Exception:
                pass  # interpreter teardown

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

    def _pool(self) -> cf.ThreadPoolExecutor:
        # ONE persistent pool per loader. The previous design (a dedicated
        # producer thread feeding a bounded Queue, plus a fresh pool per
        # epoch) spent most of its time in GIL handoff between producer and
        # consumer — machinery microbenchmark 267 clips/s vs 2,720 inline;
        # end-to-end steady state ~570 vs ~2,000 clips/s (3.5x) with
        # consumer-pulled futures (no extra thread hop).
        if self._executor is None:
            self._executor = cf.ThreadPoolExecutor(self.num_workers)
        return self._executor

    def _make_batch(self, b: np.ndarray, epoch: int) -> Any:
        # runs inside a worker: fetch + collate so the consumer thread
        # only unblocks on a finished batch. Datasets exposing
        # `getitem_at(idx, epoch)` get the epoch explicitly, making random
        # train windows a pure function of (seed, clip, epoch) — no shared
        # draw counter, so even concurrent iterators stay reproducible.
        if hasattr(self.dataset, "getitem_at"):
            return collate([self.dataset.getitem_at(j, epoch) for j in b])
        return collate([self.dataset[j] for j in b])

    def __iter__(self) -> Iterator[Any]:
        epoch = self._epoch
        idx = self._indices_for_epoch(epoch)
        self._epoch += 1
        batches: List[np.ndarray] = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        pool = self._pool()
        # one task per batch; parallelism comes from `prefetch` batches in
        # flight across the workers (within-batch fan-out measured slower:
        # 16 sub-millisecond tasks per batch are pure scheduling overhead).
        # prefetch bounds host memory: at most prefetch collated batches
        # exist at once (num_workers only caps thread concurrency).
        depth = max(self.prefetch, 1)
        pending: "collections.deque" = collections.deque()
        it = iter(batches)
        try:
            for b in itertools.islice(it, depth):
                pending.append(pool.submit(self._make_batch, b, epoch))
            while pending:
                fut = pending.popleft()
                nb = next(it, None)
                if nb is not None:
                    pending.append(pool.submit(self._make_batch, nb, epoch))
                yield fut.result()
        finally:
            # abandoned mid-epoch (break / exception / GeneratorExit):
            # cancel queued work and WAIT for running tasks, so no stale
            # dataset fetch can race a later epoch's draw-count ordering
            for f in pending:
                if not f.cancel():
                    try:
                        f.exception()
                    except BaseException:
                        pass
