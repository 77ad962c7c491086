"""Decoded-record cache: skip image/label decode after the first epoch.

The reference decodes every PNG/JPEG from disk on every epoch
(``datasets/Cityscapes.py:207-215`` via PIL).  On GPU boxes with dozens of
DataLoader worker processes that hides behind the step time; on hosts with
few cores the decode dominates the input pipeline (tools/loader_bench.py:
~0.6 s/record/core at Cityscapes full res, mostly zlib inflate).

This cache stores the *decoded* arrays (image uint8 HWC, raw label as
stored) as one ``.npy`` file per record and serves later epochs via
``np.load(mmap_mode='r')`` — the crop/augment path then only touches the
bytes it actually reads.  Properties:

- **write-through**: the first epoch populates the cache as a side effect;
  no separate build pass is needed (but ``warm()`` offers one).
- **atomic + multi-worker safe**: writes go to a pid-suffixed temp file and
  ``os.replace`` into place, so thread/process worker pools and multi-host
  runs can share a cache directory without locks.
- **self-invalidating**: the cache key hashes the source path plus its
  size and mtime, so an updated source file is decoded afresh and the stale
  entry is simply never referenced again.

Enable with ``data.cache_decoded: true`` (cache under
``~/.cache/mscs_tpu/decoded/<DATASET>``) or a directory path string.
"""
from __future__ import annotations

import hashlib
import os

import numpy as np


def default_cache_dir(dataset: str) -> str:
    base = os.environ.get("MSCS_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "mscs_tpu", "decoded")
    return os.path.join(base, dataset)


class DecodedCache:
    """Per-record decoded-array cache (memmap-served, write-through)."""

    def __init__(self, cache_dir: str):
        self.cache_dir = str(cache_dir)
        os.makedirs(self.cache_dir, exist_ok=True)

    def _entry(self, src_path) -> str:
        src = str(src_path)
        try:
            st = os.stat(src)
            stamp = f"{st.st_size}:{st.st_mtime_ns}"
        except OSError:
            stamp = "nostat"
        key = hashlib.sha1(f"{src}|{stamp}".encode()).hexdigest()[:24]
        return os.path.join(self.cache_dir, key + ".npy")

    def get(self, src_path, decode_fn) -> np.ndarray:
        """Return the decoded array for ``src_path``, decoding at most once.

        ``decode_fn()`` must return a numpy array; it runs only on a cache
        miss.  Hits are served as read-only memmaps (zero-copy until
        sliced).
        """
        path = self._entry(src_path)
        if os.path.exists(path):
            try:
                return np.load(path, mmap_mode="r")
            except (OSError, ValueError):  # truncated/corrupt: re-decode
                pass
        arr = np.ascontiguousarray(decode_fn())
        tmp = f"{path}.tmp.{os.getpid()}"
        try:
            with open(tmp, "wb") as f:
                np.save(f, arr)
            os.replace(tmp, path)
        except OSError:  # read-only/full cache dir: degrade to pass-through
            try:
                os.unlink(tmp)
            except OSError:
                pass
        return arr
