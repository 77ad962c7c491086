"""Bilinear / nearest resize with exact torch ``F.interpolate`` semantics.

`jax.image.resize` does NOT reproduce ``align_corners=True`` (the mode every
reference model uses for logit upsampling — e.g. ``models/HRNet.py:638``,
``models/DeepLabv3.py``) nor torch's legacy 'nearest' index rule
(``floor(i * in/out)``) used for label downsampling in the contrastive loss
(``losses/DenseContrastiveLossV2.py:205``).  These are re-implemented here
from the coordinate rules directly.

Design: source indices/weights are computed with numpy at **trace time**
(shapes are static under jit), so the device program is two gathers and a
lerp per axis — no dynamic shapes, fuses well under XLA.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _bilinear_idx_weights(in_size: int, out_size: int, align_corners: bool):
    """Return (lo_idx, hi_idx, hi_weight) each shape (out_size,) as numpy."""
    # torch computes source coordinates in fp32 (area_pixel_compute_source_index)
    f32 = np.float32
    if out_size == 1:
        # torch: single output sample takes source coordinate 0 (align_corners)
        # or center rule clamped; both land on index 0 weight on lo.
        if align_corners or in_size == 1:
            src = np.zeros((1,), dtype=f32)
        else:
            src = np.clip((np.arange(1, dtype=f32) + f32(0.5)) * f32(in_size / out_size)
                          - f32(0.5), 0, in_size - 1)
    elif align_corners:
        src = np.arange(out_size, dtype=f32) * f32((in_size - 1) / (out_size - 1))
    else:
        src = (np.arange(out_size, dtype=f32) + f32(0.5)) * f32(in_size / out_size) - f32(0.5)
        src = np.clip(src, f32(0.0), f32(in_size - 1))
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)
    return lo, hi, w_hi


def _nearest_idx(in_size: int, out_size: int) -> np.ndarray:
    """torch legacy 'nearest' rule: src = floor(i * in/out)."""
    idx = np.floor(np.arange(out_size, dtype=np.float64) * in_size / out_size)
    return np.clip(idx.astype(np.int64), 0, in_size - 1)


# Implementation selector: 'matmul' (interpolation-matrix einsum at HIGHEST
# precision, the default) vs 'gather' (two takes + lerp).  Both match torch
# to fp32 ulp-level; the gather form makes XLA assign gather-major layouts
# that pollute downstream conv/reduce layouts in big graphs — switching the
# HRNet train step to matmul resizes was worth +32% (PERF.md).
_RESIZE_IMPL = "matmul"


def set_resize_impl(impl: str) -> None:
    global _RESIZE_IMPL
    assert impl in ("gather", "matmul")
    _RESIZE_IMPL = impl


def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    lo, hi, w_hi = _bilinear_idx_weights(in_size, out_size, align_corners)
    a = np.zeros((out_size, in_size), np.float32)
    np.add.at(a, (np.arange(out_size), lo), 1.0 - w_hi)
    np.add.at(a, (np.arange(out_size), hi), w_hi)
    return a


def _interp_axis(x: jnp.ndarray, axis: int, in_size: int, out_size: int,
                 align_corners: bool) -> jnp.ndarray:
    if in_size == out_size:
        return x
    if _RESIZE_IMPL == "matmul":
        import jax
        a = jnp.asarray(_interp_matrix(in_size, out_size, align_corners))
        x_moved = jnp.moveaxis(x, axis, -1)
        y = jnp.einsum("oi,...i->...o", a, x_moved.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST).astype(x.dtype)
        return jnp.moveaxis(y, -1, axis)
    lo, hi, w_hi = _bilinear_idx_weights(in_size, out_size, align_corners)
    x_lo = jnp.take(x, jnp.asarray(lo), axis=axis)
    x_hi = jnp.take(x, jnp.asarray(hi), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = jnp.asarray(w_hi).reshape(shape).astype(x.dtype)
    return x_lo * (1 - w) + x_hi * w


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int],
                    align_corners: bool = True,
                    h_axis: int = -3, w_axis: int = -2) -> jnp.ndarray:
    """Bilinear resize of NHWC (default) or arbitrary-axis tensors.

    Matches ``torch.nn.functional.interpolate(mode='bilinear',
    align_corners=...)`` exactly (fp32 ulp-level).
    """
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    x = _interp_axis(x, h_axis, x.shape[h_axis], out_h, align_corners)
    x = _interp_axis(x, w_axis, x.shape[w_axis], out_w, align_corners)
    return x


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int],
                   h_axis: int = -3, w_axis: int = -2) -> jnp.ndarray:
    """Nearest resize matching torch ``F.interpolate(mode='nearest')``."""
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    if x.shape[h_axis] != out_h:
        x = jnp.take(x, jnp.asarray(_nearest_idx(x.shape[h_axis], out_h)), axis=h_axis)
    if x.shape[w_axis] != out_w:
        x = jnp.take(x, jnp.asarray(_nearest_idx(x.shape[w_axis], out_w)), axis=w_axis)
    return x


def downsample_labels_nearest(labels: jnp.ndarray, scale: int) -> jnp.ndarray:
    """N,H,W int labels -> N,H//scale,W//scale via torch-'nearest' rule.

    This is the label pyramid builder of the dense contrastive loss
    (reference ``losses/DenseContrastiveLossV2.py:194-206``).
    """
    n, h, w = labels.shape
    return resize_nearest(labels[..., None], (h // scale, w // scale))[..., 0]
