"""Adaptive average pooling with exact torch semantics.

``nn.AdaptiveAvgPool2d(k)`` bins: start = floor(i*H/k), end = ceil((i+1)*H/k).
Implemented as two per-axis pooling matmuls built at trace time — lands on
the MXU instead of a gather/segment pattern.  Used by UPerNet's PPM
(ref ``models/UPerNet.py:33-45``) and by any global-pool path.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        s = int(np.floor(i * in_size / out_size))
        e = int(np.ceil((i + 1) * in_size / out_size))
        m[i, s:e] = 1.0 / (e - s)
    return m


def adaptive_avg_pool(x: jnp.ndarray, out_hw: int | tuple[int, int]) -> jnp.ndarray:
    """x: (..., H, W, C) -> (..., h, w, C), torch AdaptiveAvgPool2d parity."""
    if isinstance(out_hw, int):
        out_hw = (out_hw, out_hw)
    h, w = x.shape[-3], x.shape[-2]
    mh = jnp.asarray(_pool_matrix(h, out_hw[0]))
    mw = jnp.asarray(_pool_matrix(w, out_hw[1]))
    x = jnp.einsum("oh,...hwc->...owc", mh.astype(x.dtype), x)
    x = jnp.einsum("ow,...hwc->...hoc", mw.astype(x.dtype), x)
    return x
