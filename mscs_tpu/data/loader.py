"""Host data loader: parallel decode/augment workers + device prefetch.

Replaces torch DataLoader + DistributedSampler (ref
``managers/BaseManager.py:279-435``): fixed-shape batches are assembled on
the host by a worker pool, sharded onto the mesh's data axis, and prefetched
so the next batch's H2D copy overlaps the current step.  Multi-host runs
slice the global index order by process, like DistributedSampler rank
sharding.

``worker_type``: 'thread' (default — zero setup cost, fine when decode/
augment release the GIL or the host has few cores) or 'process' (true
parallelism across cores, the torch-DataLoader model; spawn context so no
TPU runtime state is forked into workers).  Records are fetched through a
bounded in-flight window so augmentation of future batches overlaps the
current training step regardless of pool type.
"""
from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator

import jax
import numpy as np

from mscs_tpu.data.sampler import repeat_factor_indices, shuffled_indices
from mscs_tpu.data.transforms import seed_transform_rng
from mscs_tpu.parallel.mesh import shard_batch, shard_grouped_batch

_WORKER_DATASET = None


def _process_worker_init(dataset) -> None:
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _process_worker_fetch(i: int, rec_seed):
    seed_transform_rng(rec_seed)
    return _WORKER_DATASET[int(i)]


def _thread_worker_fetch(dataset, i: int, rec_seed):
    seed_transform_rng(rec_seed)
    return dataset[int(i)]


class DataLoader:
    """Epoch-based iterator of {'image', 'label'} numpy batches."""

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 4, seed: int = 0,
                 repeat_factors: np.ndarray | None = None,
                 process_index: int | None = None,
                 process_count: int | None = None,
                 worker_type: str = "thread"):
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
        self.worker_type = worker_type
        self.epoch = 0
        self._pool = None

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

    # ------------------------------------------------------------- pool mgmt
    def _submit_fn(self):
        """Returns submit(i, rec_seed) -> handle and result(handle) -> record.

        ``rec_seed`` seeds the worker's thread-local augmentation RNG before
        the fetch (transforms.seed_transform_rng) so each record's random
        transforms are a pure function of (loader seed, epoch, position) —
        deterministic for any worker count/type/scheduling."""
        if self.worker_type == "process":
            if self._pool is None:
                import multiprocessing as mp
                ctx = mp.get_context("spawn")
                self._pool = ctx.Pool(self.num_workers,
                                      initializer=_process_worker_init,
                                      initargs=(self.dataset,))
            pool = self._pool
            return (lambda i, s: pool.apply_async(_process_worker_fetch,
                                                  (int(i), s)),
                    lambda h: h.get())
        if self._pool is None:
            self._pool = ThreadPoolExecutor(self.num_workers)
        pool = self._pool
        ds = self.dataset
        return (lambda i, s: pool.submit(_thread_worker_fetch, ds, int(i), s),
                lambda h: h.result())

    def close(self) -> None:
        if self._pool is not None:
            if self.worker_type == "process":
                self._pool.terminate()
            else:
                self._pool.shutdown(wait=False)
            self._pool = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass

    # -------------------------------------------------------------- iteration
    def __iter__(self) -> Iterator[dict[str, Any]]:
        idx = self._epoch_indices()
        nb = len(self)
        flat = idx[: nb * self.batch_size] if self.drop_last else idx
        submit, result = self._submit_fn()

        # bounded in-flight window: workers keep decoding ahead of training
        ahead = max(self.num_workers * 2, self.batch_size + 1)
        handles: collections.deque = collections.deque()
        it = ((pos, i, (self.seed, self.epoch, pos)) for pos, i
              in enumerate(flat))
        for _ in range(ahead):
            try:
                _, i, s = next(it)
                handles.append(submit(i, s))
            except StopIteration:
                break

        def records():
            while handles:
                h = handles.popleft()
                try:
                    _, i, s = next(it)
                    handles.append(submit(i, s))
                except StopIteration:
                    pass
                yield result(h)

        rec_it = records()
        for b in range(nb):
            want = (self.batch_size if self.drop_last or b < nb - 1
                    else len(flat) - b * self.batch_size)
            recs = [r for _, r in zip(range(want), rec_it)]
            if not recs:
                return
            imgs = np.stack([r[0] for r in recs]).astype(np.float32)
            lbls = np.stack([r[1] for r in recs]).astype(np.int32)
            metas = [r[2] for r in recs]
            yield {"image": imgs, "label": lbls, "metadata": metas}


def device_prefetch(iterator, mesh, size: int = 2, group: int = 1):
    """Move batches onto the mesh ahead of consumption (ref pin_memory +
    non_blocking H2D, HRNet_Manager.py:100 — but overlapped, not synchronous).

    ``group > 1`` (train.steps_per_call): stacks ``group`` host batches on a
    new leading step axis and ships them in ONE transfer for a scanned
    multi-step (axis 1 stays the device-sharded batch axis).  The trailing
    partial group (fewer than ``group`` batches left) is emitted with a
    shorter step axis.  Grouped batches carry ``"_steps"``; metadata becomes
    a list of per-step metadata.

    Grouping stacks host batches, so shapes inside one group must agree.
    The train loader guarantees this with ``drop_last=True``; for any other
    source (e.g. a drop_last=False epoch tail) a batch whose shape differs
    from the group's first is held back and flushed as the start of the
    next (shorter) group instead of crashing np.stack (ADVICE r2)."""
    buf: collections.deque = collections.deque()
    it = iter(iterator)
    held: list = []  # ragged-shape batch carried over to the next group

    def _shape_sig(batch):
        return tuple(sorted((k, np.shape(v)) for k, v in batch.items()
                            if k != "metadata"))

    def pull():
        if group <= 1:
            batch = next(it)  # StopIteration ends the stream
            arrays = {k: v for k, v in batch.items() if k != "metadata"}
            device_batch = shard_batch(mesh, arrays)
            device_batch["metadata"] = batch.get("metadata")
            return device_batch
        host = list(held)
        held.clear()
        while len(host) < group:
            try:
                nxt = next(it)
            except StopIteration:
                break
            if host and _shape_sig(nxt) != _shape_sig(host[0]):
                held.append(nxt)  # flush current group early
                break
            host.append(nxt)
        if not host:
            raise StopIteration
        arrays = {k: np.stack([h[k] for h in host])
                  for k in host[0] if k != "metadata"}
        device_batch = shard_grouped_batch(mesh, arrays)
        device_batch["metadata"] = [h.get("metadata") for h in host]
        device_batch["_steps"] = len(host)
        return device_batch

    def put():
        buf.append(pull())

    try:
        for _ in range(size):
            put()
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            put()
        except StopIteration:
            pass
        yield out
