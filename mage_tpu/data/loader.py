"""A lightweight batching loader over map-style datasets.

Replaces torch's DataLoader + DistributedSampler for this framework
(reference: main_mage.py:108-119). Single-controller JAX: with multiple
processes, each takes a disjoint contiguous shard of the epoch permutation
(the DistributedSampler equivalent); arrays are collated host-side and the
trainer places them onto the mesh with ``shard_batch``.
"""

from __future__ import annotations

import numpy as np
from typing import Any, Callable, Iterator, Optional


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        collate_fn: Optional[Callable] = None,
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.collate_fn = collate_fn or default_collate
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reshuffle deterministically per epoch (the reference's
        ``sampler.set_epoch``, main_mage.py:138-139)."""
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            order = np.random.RandomState(self.seed + self.epoch).permutation(n)
        else:
            order = np.arange(n)
        if self.num_shards > 1:
            per = n // self.num_shards
            order = order[self.shard_index * per : (self.shard_index + 1) * per]
        return order

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Any]:
        order = self._indices()
        for start in range(0, len(order), self.batch_size):
            chunk = order[start : start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield self.collate_fn([self.dataset[int(i)] for i in chunk])


class PrefetchLoader:
    """Background-thread prefetching around a Loader: overlaps host-side
    decode/collate with device compute (device steps release the GIL).
    Single-threaded equivalent of the reference's ``num_workers=4``
    DataLoader (main_mage.py:114-119) sized for 1-vCPU TPU VM hosts."""

    def __init__(self, loader: "Loader", depth: int = 2):
        self.loader = loader
        self.depth = depth

    def set_epoch(self, epoch: int) -> None:
        self.loader.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        sentinel = object()

        def worker():
            try:
                for batch in self.loader:
                    q.put(batch)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()


def default_collate(items: list) -> Any:
    first = items[0]
    if isinstance(first, dict):
        return {k: default_collate([d[k] for d in items]) for k in first}
    if isinstance(first, (str, bytes)):
        return list(items)
    arrs = [np.asarray(x) for x in items]
    return np.stack(arrs)
