"""Host data loader: threaded decode/augment workers + device prefetch.

Replaces torch DataLoader + DistributedSampler (ref
``managers/BaseManager.py:279-435``): fixed-shape batches are assembled on
the host by a thread pool, sharded onto the mesh's data axis, and prefetched
so the next batch's H2D copy overlaps the current step.  Multi-host runs
slice the global index order by process, like DistributedSampler rank
sharding.
"""
from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator

import jax
import numpy as np

from mscs_tpu.data.sampler import repeat_factor_indices, shuffled_indices
from mscs_tpu.parallel.mesh import shard_batch


class DataLoader:
    """Epoch-based iterator of {'image', 'label'} numpy batches."""

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 4, seed: int = 0,
                 repeat_factors: np.ndarray | None = None,
                 process_index: int | None = None,
                 process_count: int | None = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.repeat_factors = repeat_factors
        self.process_index = (jax.process_index() if process_index is None
                              else process_index)
        self.process_count = (jax.process_count() if process_count is None
                              else process_count)
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """DistributedSampler.set_epoch equivalent (ref :156-157)."""
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        if self.repeat_factors is not None:
            idx = repeat_factor_indices(self.repeat_factors, self.epoch,
                                        self.seed, self.shuffle)
        else:
            idx = shuffled_indices(len(self.dataset), self.epoch, self.seed,
                                   self.shuffle)
        # per-host shard (round-robin like DistributedSampler)
        return idx[self.process_index::self.process_count]

    def __len__(self) -> int:
        n = len(self._epoch_indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict[str, Any]]:
        idx = self._epoch_indices()
        nb = len(self)
        with ThreadPoolExecutor(self.num_workers) as pool:
            def fetch(i):
                return self.dataset[int(i)]

            for b in range(nb):
                chunk = idx[b * self.batch_size:(b + 1) * self.batch_size]
                recs = list(pool.map(fetch, chunk))
                imgs = np.stack([r[0] for r in recs]).astype(np.float32)
                lbls = np.stack([r[1] for r in recs]).astype(np.int32)
                metas = [r[2] for r in recs]
                yield {"image": imgs, "label": lbls, "metadata": metas}


def device_prefetch(iterator, mesh, size: int = 2):
    """Move batches onto the mesh ahead of consumption (ref pin_memory +
    non_blocking H2D, HRNet_Manager.py:100 — but overlapped, not synchronous)."""
    buf: collections.deque = collections.deque()

    def put(batch):
        arrays = {k: v for k, v in batch.items() if k != "metadata"}
        device_batch = shard_batch(mesh, arrays)
        device_batch["metadata"] = batch.get("metadata")
        buf.append(device_batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            put(next(it))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass
        yield out
