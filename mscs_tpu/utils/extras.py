"""Off-main-path utilities kept for surface parity (SURVEY.md §2.5 "dormant
extras"): detectron2-style point_sample (ref ``utils/pointrend_utils.py``)
and the semi-supervised BalancedConcatDataset (ref ``utils/semi_utis.py``).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def point_sample(features: jnp.ndarray, points: jnp.ndarray,
                 align_corners: bool = False) -> jnp.ndarray:
    """Bilinear feature sampling at normalised point coordinates.

    :param features: (N, H, W, C)
    :param points: (N, P, 2) xy in [0, 1]
    :returns: (N, P, C) — torch grid_sample semantics for the coordinate
        transform (align_corners True: x*(S-1); False: x*S - 0.5, clamped).
    """
    n, h, w, c = features.shape
    xy = points.astype(jnp.float32)
    if align_corners:
        px = xy[..., 0] * (w - 1)
        py = xy[..., 1] * (h - 1)
    else:
        # torch zero-padding: out-of-range taps contribute 0
        px = xy[..., 0] * w - 0.5
        py = xy[..., 1] * h - 0.5
    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    wx = (px - x0f)[..., None]
    wy = (py - y0f)[..., None]
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    batch = jnp.arange(n)[:, None]

    def tap(yi, xi):
        inb = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[..., None]
        f = features[batch, jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inb, f, 0.0)

    top = tap(y0, x0) * (1 - wx) + tap(y0, x0 + 1) * wx
    bot = tap(y0 + 1, x0) * (1 - wx) + tap(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


class BalancedConcatDataset:
    """Concatenate datasets, oversampling shorter ones to the longest length
    (ref utils/semi_utis.py BalancedConcatDataset)."""

    def __init__(self, *datasets):
        assert datasets
        self.datasets = list(datasets)
        self.max_len = max(len(d) for d in self.datasets)

    def __len__(self) -> int:
        return self.max_len * len(self.datasets)

    def __getitem__(self, index: int):
        ds_idx, offset = divmod(index, self.max_len)
        ds = self.datasets[ds_idx]
        return ds[offset % len(ds)]
