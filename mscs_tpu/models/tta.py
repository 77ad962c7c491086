"""Test-time augmentation (multi-scale / flip / sliding-window) — device-side.

Capability port of the four reference TTA wrappers (``models/TTA_wrapper.py``,
``TTA_wrapper_CTS.py``, ``TTAWrapperSlide.py``, ``TTA_wrapper_PC.py``) with
their exact accumulation semantics:

- base: sum over {flip, identity} x scales of un-flipped, un-resized logits,
  divided by 2*len(scales) (ref TTA_wrapper.py:55-78)
- CTS/Slide/PC: per scale, resize (long-side 2048*s for CTS, min-side base
  for PC), flip-averaged ``pred.exp()`` accumulation over a sliding crop grid
  with overlap-count normalisation, bilinear resize back, summed over scales
  (ref TTA_wrapper_CTS.py:29-147)

TPU redesign: the reference bounces every scale/crop through numpy/cv2
(GPU->CPU->GPU); here everything stays on device — crops are gathered into
ONE batched model call per scale (MXU-friendly), scattered back with static
offsets, and each (scale, shape) pair compiles once.
"""
from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mscs_tpu.ops.resize import resize_bilinear


from functools import partial


@partial(jax.jit, static_argnums=(2, 3))
def _gather_crops(img: jnp.ndarray, origins: jnp.ndarray,
                  ch: int, cw: int) -> jnp.ndarray:
    """(1,H,W,3) + (K,2) origins -> (K,ch,cw,3): one vmapped dynamic_slice
    (constant trace size for any grid)."""
    return jax.vmap(lambda o: jax.lax.dynamic_slice(
        img[0], (o[0], o[1], 0), (ch, cw, 3)))(origins)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _scatter_add(preds: jnp.ndarray, origins: jnp.ndarray, h: int, w: int,
                 ch: int, cw: int, c: int) -> jnp.ndarray:
    """Overlap-count-normalised scatter-add of (K,ch,cw,C) crop predictions
    as one lax.scan — trace time independent of grid size (the reference
    python-loops crops, TTA_wrapper_CTS.py:116-133)."""
    out0 = jnp.zeros((h, w, c), jnp.float32)
    cnt0 = jnp.zeros((h, w, 1), jnp.float32)
    ones = jnp.ones((ch, cw, 1), jnp.float32)

    def body(carry, inp):
        out, cnt = carry
        pred, o = inp
        idx = (o[0], o[1], 0)
        out = jax.lax.dynamic_update_slice(
            out, jax.lax.dynamic_slice(out, idx, (ch, cw, c)) + pred, idx)
        cnt = jax.lax.dynamic_update_slice(
            cnt, jax.lax.dynamic_slice(cnt, idx, (ch, cw, 1)) + ones, idx)
        return (out, cnt), None

    (out, cnt), _ = jax.lax.scan(body, (out0, cnt0), (preds, origins))
    return (out / cnt)[None]


def _crop_grid(h: int, w: int, crop: tuple[int, int],
               stride: tuple[int, int]) -> list[tuple[int, int]]:
    """Static crop origins, reference clamping rule (CTS :116-123)."""
    rows = int(math.ceil(max(h - crop[0], 0) / stride[0])) + 1
    cols = int(math.ceil(max(w - crop[1], 0) / stride[1])) + 1
    out = []
    for r in range(rows):
        for c in range(cols):
            h1 = min(r * stride[0] + crop[0], h)
            w1 = min(c * stride[1] + crop[1], w)
            out.append((max(h1 - crop[0], 0), max(w1 - crop[1], 0)))
    return out


class TTAWrapper:
    """Whole-image multi-scale + horizontal-flip TTA (ref TTA_wrapper.py)."""

    def __init__(self, apply_fn: Callable, num_classes: int,
                 scales: Sequence[float] | None = None, flip: bool = True,
                 align_corners: bool = True):
        self.apply_fn = apply_fn  # (N,H,W,3) -> (N,H,W,C) upsampled logits
        self.num_classes = num_classes
        self.scales = list(scales or [])
        if 1.0 not in self.scales:
            self.scales.append(1.0)
        self.flip = flip
        self.align_corners = align_corners

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_hw = x.shape[1:3]
        merged = jnp.zeros(x.shape[:3] + (self.num_classes,), jnp.float32)
        for f in range(2):
            x_f = jnp.flip(x, axis=2) if f == 0 else x
            for s in self.scales:
                hw = (int(s * in_hw[0]), int(s * in_hw[1]))
                x_fs = (resize_bilinear(x_f, hw, self.align_corners)
                        if s != 1.0 else x_f)
                y = self.apply_fn(x_fs)
                y = jnp.flip(y, axis=2) if f == 0 else y
                merged = merged + resize_bilinear(y, in_hw, self.align_corners)
        return merged / (2 * len(self.scales))


class SlidingWindowTTA:
    """Scale + flip + sliding-window protocol (CTS/ADE20K/PascalC variants)."""

    def __init__(self, apply_fn: Callable, num_classes: int,
                 scales: Sequence[float] | None = None, flip: bool = True,
                 crop_size=(512, 1024), strides=None, base_size: int = 2048,
                 size_mode: str = "long",  # 'long' (CTS/Slide) | 'min' (PC)
                 align_corners: bool = True,
                 pad_value: np.ndarray | float = 0.0,
                 crop_chunk: int = 8,
                 mesh=None):
        """``mesh``: optional data mesh — sliding-window crop batches are
        sharded over its devices, so full-res TTA scales with chip count
        (the reference runs crops one by one on a single GPU)."""
        self.apply_fn = apply_fn
        self.mesh = mesh
        self.num_classes = num_classes
        self.scales = list(scales or [])
        if 1.0 not in self.scales:
            self.scales.append(1.0)
        self.flip = flip
        self.crop_size = tuple(crop_size)
        self.strides = tuple(strides) if strides else self.crop_size
        self.base_size = base_size
        self.size_mode = size_mode
        self.align_corners = align_corners
        self.pad_value = pad_value
        self.crop_chunk = crop_chunk

    # -- helpers -------------------------------------------------------------
    def _scaled_hw(self, h: int, w: int, scale: float) -> tuple[int, int]:
        if self.size_mode == "long":
            long_size = int(self.base_size * scale + 0.5)
            if h > w:
                return long_size, int(w * long_size / h + 0.5)
            return int(h * long_size / w + 0.5), long_size
        # 'min': PascalC protocol, min side = base_size * scale
        short = int(self.base_size * scale + 0.5)
        if h < w:
            return short, int(w * short / h + 0.5)
        return int(h * short / w + 0.5), short

    def _infer(self, img: jnp.ndarray) -> jnp.ndarray:
        """Flip-averaged exp(logits) (ref CTS inference :29-53)."""
        pred = self.apply_fn(img)
        if self.flip:
            pred_f = jnp.flip(self.apply_fn(jnp.flip(img, axis=2)), axis=2)
            pred = (pred + pred_f) * 0.5
        return jnp.exp(pred)

    def _gather(self, img: jnp.ndarray, origins: np.ndarray) -> jnp.ndarray:
        ch, cw = self.crop_size
        return _gather_crops(img, jnp.asarray(origins, jnp.int32), ch, cw)

    def _scatter(self, preds: jnp.ndarray, origins: np.ndarray,
                 h: int, w: int) -> jnp.ndarray:
        ch, cw = self.crop_size
        return _scatter_add(preds, jnp.asarray(origins, jnp.int32), h, w,
                            ch, cw, self.num_classes)

    def _slide(self, img: jnp.ndarray) -> jnp.ndarray:
        """Batched sliding-window inference over one (1,H,W,3) image.

        The model only ever sees fixed (chunk, ch, cw, 3) batches, so its
        (expensive) compile is shared across every image shape and scale;
        gather/scatter compile per shape but are trivial scan programs."""
        _, h, w, _ = img.shape
        ch, cw = self.crop_size
        origins = np.asarray(_crop_grid(h, w, self.crop_size, self.strides),
                             np.int32)
        crops = self._gather(img, origins)
        n = crops.shape[0]
        if self.mesh is not None and np.prod(self.mesh.devices.shape) > 1:
            # shard the crop batch over the data mesh (pad to divisibility)
            from mscs_tpu.parallel.mesh import batch_sharding
            n_dev = int(np.prod(self.mesh.devices.shape))
            pad = (-n) % n_dev
            if pad:
                crops = jnp.concatenate(
                    [crops, jnp.zeros((pad, ch, cw, 3), crops.dtype)], axis=0)
            crops = jax.device_put(crops, batch_sharding(self.mesh))
            preds = self._infer(crops)[:n]
        else:
            # fixed-size chunks: always pad up to crop_chunk — a
            # min(chunk, n) here would compile an extra model program per
            # distinct small grid size, defeating the shared-compile design
            chunk = self.crop_chunk
            pad = (-n) % chunk
            if pad:
                crops = jnp.concatenate(
                    [crops, jnp.zeros((pad, ch, cw, 3), crops.dtype)], axis=0)
            preds = jnp.concatenate(
                [self._infer(crops[i:i + chunk])
                 for i in range(0, n + pad, chunk)], axis=0)[:n]
        return self._scatter(preds, origins, h, w)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (1, H, W, 3) normalised image -> (1, H, W, C) accumulated probs."""
        _, ori_h, ori_w, _ = x.shape
        final = jnp.zeros((1, ori_h, ori_w, self.num_classes), jnp.float32)
        for scale in self.scales:
            nh, nw = self._scaled_hw(ori_h, ori_w, scale)
            img = resize_bilinear(x, (nh, nw), align_corners=False)  # cv2 rule
            ch, cw = self.crop_size
            if (self.size_mode == "long" and scale < 1.0) or (
                    self.size_mode == "min" and max(nh, nw) <= min(ch, cw)):
                # whole-image path (pad up to crop if needed)
                pad_h, pad_w = max(ch - nh, 0), max(cw - nw, 0)
                if pad_h or pad_w:
                    pv = jnp.asarray(self.pad_value, jnp.float32)
                    img_p = jnp.zeros((1, nh + pad_h, nw + pad_w, 3)) + pv
                    img = jax.lax.dynamic_update_slice(img_p, img, (0, 0, 0, 0))
                preds = self._infer(img)[:, :nh, :nw]
            else:
                pad_h, pad_w = max(ch - nh, 0), max(cw - nw, 0)
                if pad_h or pad_w:
                    pv = jnp.asarray(self.pad_value, jnp.float32)
                    img_p = jnp.zeros((1, nh + pad_h, nw + pad_w, 3)) + pv
                    img = jax.lax.dynamic_update_slice(img_p, img, (0, 0, 0, 0))
                preds = self._slide(img)[:, :nh, :nw]
            final = final + resize_bilinear(preds, (ori_h, ori_w),
                                            self.align_corners)
        return final


def build_tta(apply_fn, config: dict, num_classes: int, mesh=None):
    """Dataset-dispatched TTA construction (ref BaseManager.py:620-634)."""
    dataset = config["data"]["dataset"]
    scales = config.get("tta_scales", [0.75, 1.25, 1.5, 1.75, 2.0])
    align = config["graph"].get("align_corners", True)
    base = config.get("tta_base_size")  # protocol default per dataset below
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    if dataset == "CITYSCAPES":
        crop = config["data"].get("transform_values", {}).get(
            "crop_shape", [512, 1024])
        return SlidingWindowTTA(apply_fn, num_classes, scales,
                                crop_size=crop, base_size=base or 2048,
                                size_mode="long", align_corners=align, mesh=mesh)
    if dataset == "ADE20K":
        return SlidingWindowTTA(apply_fn, num_classes, scales,
                                crop_size=[512, 512],
                                strides=[341, 341], base_size=base or 2048,
                                size_mode="long", align_corners=align, mesh=mesh)
    if dataset == "PASCALC":
        return SlidingWindowTTA(apply_fn, num_classes, scales,
                                crop_size=[512, 512], base_size=base or 520,
                                size_mode="min", align_corners=align,
                                strides=[int(512 * 2 / 3)] * 2,
                                pad_value=-mean / std, mesh=mesh)
    return TTAWrapper(apply_fn, num_classes, scales, align_corners=align)
