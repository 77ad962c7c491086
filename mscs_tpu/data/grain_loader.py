"""Grain-backed host input pipeline (alternative loader backend).

Drop-in replacement for :class:`mscs_tpu.data.loader.DataLoader` built on
Google Grain (pygrain), the TPU-ecosystem host loader.  Selected with
``data.loader_backend: "grain"``; covers the same ground as the reference's
torch ``DataLoader`` + ``DistributedSampler`` stack (ref
``managers/BaseManager.py:279-435``) but delegates worker management,
prefetch, and back-pressure to Grain's multiprocessing engine.

Design notes
------------
* **Identical batches to the native backend.**  Epoch index order (shuffle,
  repeat-factor schedule, per-host shard) is computed by the same
  ``_epoch_indices`` the native loader uses, and every record's augmentation
  RNG is seeded from the same ``(seed, epoch, position)`` triple — so for a
  given config the Grain backend emits bit-identical batches to the native
  one, for any worker count.  ``tests/test_grain_loader.py`` asserts this.
* **Grain sees a pre-ordered source.**  Rather than translating our three
  order sources (shuffle / repeat-factor / per-host shard) into Grain
  sampler configuration, each epoch wraps the resolved index array in a
  :class:`_EpochSource` and iterates it with a sequential
  ``IndexSampler(shuffle=False)``.  Grain then only does what it is best
  at: parallel record fetch with deterministic ordered delivery.
* **Batching stays on our side.**  Records carry heterogeneous metadata
  dicts (eval resize/pad protocol); Grain's ``Batch`` tree-stacks leaves,
  which would reshape that metadata.  We assemble ``{'image','label',
  'metadata'}`` batches exactly like the native loader, preserving the
  downstream contract (``device_prefetch`` grouping included).
* ``num_workers <= 1`` runs Grain in-process (``worker_count=0``): no
  spawn cost, right default for tests and single-core hosts.  Larger
  values spawn that many Grain worker processes per epoch; the dataset
  must be picklable (same contract as ``worker_type='process'``).
  Per-epoch spawn cost is measured (tools/loader_bench.py --spawn-cost:
  ~15 s/epoch at 2 workers on a 1-core host vs the native process pool's
  one-time spawn) and documented in configs/README.md — prefer the native
  process pool for many short epochs.
"""
from __future__ import annotations

from typing import Any, Iterator

import numpy as np

from mscs_tpu.data.loader import DataLoader
from mscs_tpu.data.transforms import seed_transform_rng


class _EpochSource:
    """Grain ``RandomAccessDataSource`` over one epoch's resolved order.

    ``__getitem__(pos)`` seeds the worker-local augmentation RNG from
    ``(loader seed, epoch, pos)`` before fetching, making each record's
    random transforms a pure function of its epoch position — the same
    determinism contract as the native loader's worker fetch.
    """

    def __init__(self, dataset, indices: np.ndarray, seed: int, epoch: int):
        self._dataset = dataset
        self._indices = np.asarray(indices)
        self._seed = seed
        self._epoch = epoch

    def __len__(self) -> int:
        return len(self._indices)

    def __getitem__(self, pos: int):
        pos = int(pos)
        seed_transform_rng((self._seed, self._epoch, pos))
        return self._dataset[int(self._indices[pos])]


class GrainDataLoader(DataLoader):
    """``DataLoader`` with record fetch delegated to Grain.

    Inherits the epoch/index logic (``set_epoch``, ``_epoch_indices``,
    ``__len__``) and overrides only iteration; ``close()`` is a no-op
    because Grain workers are scoped to each epoch's iterator.
    """

    def _grain_iter(self, flat: np.ndarray):
        import grain.python as gp

        source = _EpochSource(self.dataset, flat, self.seed, self.epoch)
        sampler = gp.IndexSampler(
            len(flat), shard_options=gp.NoSharding(), shuffle=False,
            num_epochs=1)
        worker_count = self.num_workers if self.num_workers > 1 else 0
        prefetch = max(2 * self.batch_size, 8)
        loader = gp.DataLoader(
            data_source=source, sampler=sampler, worker_count=worker_count,
            worker_buffer_size=max(2, self.batch_size),
            read_options=gp.ReadOptions(num_threads=min(16, prefetch),
                                        prefetch_buffer_size=prefetch))
        return iter(loader)

    def close(self) -> None:  # no persistent pool to shut down
        pass

    def __iter__(self) -> Iterator[dict[str, Any]]:
        idx = self._epoch_indices()
        nb = len(self)
        flat = idx[: nb * self.batch_size] if self.drop_last else idx
        if len(flat) == 0:
            return
        rec_it = self._grain_iter(np.asarray(flat))
        try:
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
        finally:
            # Early epoch exits (trainer debug-mode 3-batch truncation,
            # bounded validate/infer loops) close this generator mid-epoch;
            # drop the Grain iterator reference HERE so its worker processes
            # terminate promptly instead of at whenever-GC (ADVICE r3).
            del rec_it


def build_loader(backend: str, *args, **kwargs) -> DataLoader:
    """Construct a loader for ``data.loader_backend`` ('native' | 'grain')."""
    if backend == "grain":
        return GrainDataLoader(*args, **kwargs)
    if backend in ("native", "default", "", None):
        return DataLoader(*args, **kwargs)
    raise ValueError(f"unknown loader_backend {backend!r} "
                     "(expected 'native' or 'grain')")
