"""Test-time augmentation (multi-scale / flip / sliding-window) — device-side.

Capability port of the four reference TTA wrappers (``models/TTA_wrapper.py``,
``TTA_wrapper_CTS.py``, ``TTAWrapperSlide.py``, ``TTA_wrapper_PC.py``) with
their exact accumulation semantics, verified output-for-output against the
imported upstream wrappers (tests/test_tta_oracle.py).  Protocol quirks
reproduced deliberately:

- CTS (``TTA_wrapper_CTS.py:80-147``): per scale, cv2 long-side resize to
  ``2048*s`` (half-pixel bilinear); scale<1 runs the WHOLE resized image
  through the model with flip hardcoded True (:106-109); scale>=1 slides a
  crop grid with CLAMPED edge origins (:117-124), flip-averaged
  ``pred.exp()`` accumulation and overlap-count normalisation; bilinear
  (align_corners) resize back; summed over scales.
- Slide / ADE20K (``TTAWrapperSlide.py:28-38,105-145``): resizes to the
  FIXED shape ``(2048*s, 512*s)`` h x w (aspect-destroying — the upstream
  code applies mmseg's img_scale tuple literally), and accumulates TWO
  entries per scale: one flip-averaged and one unflipped (the
  scales x [True, False] product list).  No whole-image path.
- PC / PascalContext (``TTA_wrapper_PC.py:45-160``): long-side resize to
  ``520*s``; whole-image path when ``max(h,w) <= min(crop)`` (pad to crop
  with -mean/std, slice back); otherwise an UNCLAMPED grid (origins at
  ``r*stride`` even at the edge — the clamp lines are commented out
  upstream :134-135) whose edge crops are padded to full crop size, with
  only the in-image region accumulated; every inference call passes
  flip=True regardless of config.

TPU redesign: the reference bounces every scale/crop through numpy/cv2
(GPU->CPU->GPU); here everything stays on device — crops are gathered into
ONE batched model call per scale (MXU-friendly), scattered back with static
offsets, and each (scale, shape) pair compiles once.  Crops use the
EFFECTIVE size ``min(crop, image)`` per dim, so small scaled images reach
the model at their natural size exactly as upstream (no hidden padding).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mscs_tpu.ops.resize import resize_bilinear


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


def _grid_rows_cols(h: int, w: int, crop, stride) -> tuple[int, int]:
    """Reference row/col count: int(ceil((size - crop)/stride)) + 1
    (negative -> 0 via ceil, so always >= 1)."""
    rows = int(math.ceil(max(h - crop[0], 0) / stride[0])) + 1
    cols = int(math.ceil(max(w - crop[1], 0) / stride[1])) + 1
    return rows, cols


def _crop_grid(h: int, w: int, crop: tuple[int, int],
               stride: tuple[int, int],
               clamp: bool = True) -> list[tuple[int, int]]:
    """Static crop origins.  ``clamp=True``: edge origins pulled back so
    crops stay in-image (CTS/Slide rule, TTA_wrapper_CTS.py:116-123).
    ``clamp=False``: origins stay at r*stride and edge crops overhang
    (PC rule — the clamp is commented out upstream, TTA_wrapper_PC.py:134)."""
    rows, cols = _grid_rows_cols(h, w, crop, stride)
    out = []
    for r in range(rows):
        for c in range(cols):
            if clamp:
                h1 = min(r * stride[0] + crop[0], h)
                w1 = min(c * stride[1] + crop[1], w)
                out.append((max(h1 - crop[0], 0), max(w1 - crop[1], 0)))
            else:
                out.append((r * stride[0], c * stride[1]))
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
    """Scale + flip + sliding-window protocol (CTS/ADE20K-Slide/PC variants).

    Protocol knobs (see module docstring for the reference semantics each
    reproduces):

    - ``size_mode``: 'long' — long side resized to ``base_size*scale``
      (CTS base 2048, PC base 520); 'fixed' — resize to
      ``(fixed_hw[0]*scale, fixed_hw[1]*scale)`` exactly (Slide).
    - ``grid_mode``: 'clamp' (CTS/Slide) | 'pad' (PC).
    - ``flip_mode``: 'avg' — one flip-averaged pass per scale (CTS/PC);
      'both' — accumulate a flip-averaged AND an unflipped pass (Slide).
    - ``whole_image``: 'scale_lt_1' (CTS: scale<1 skips sliding, flip
      hardcoded True) | 'fits_crop' (PC: max(h,w) <= min(crop)) | 'never'.
    """

    def __init__(self, apply_fn: Callable, num_classes: int,
                 scales: Sequence[float] | None = None, flip: bool = True,
                 crop_size=(512, 1024), strides=None, base_size: int = 2048,
                 size_mode: str = "long",
                 fixed_hw: tuple[int, int] = (2048, 512),
                 grid_mode: str = "clamp",
                 flip_mode: str = "avg",
                 whole_image: str = "scale_lt_1",
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
        assert size_mode in ("long", "fixed"), size_mode
        assert grid_mode in ("clamp", "pad"), grid_mode
        assert flip_mode in ("avg", "both"), flip_mode
        assert whole_image in ("scale_lt_1", "fits_crop", "never"), whole_image
        self.size_mode = size_mode
        self.fixed_hw = tuple(fixed_hw)
        self.grid_mode = grid_mode
        self.flip_mode = flip_mode
        self.whole_image = whole_image
        self.align_corners = align_corners
        self.pad_value = pad_value
        self.crop_chunk = crop_chunk

    # -- helpers -------------------------------------------------------------
    def _scaled_hw(self, h: int, w: int, scale: float) -> tuple[int, int]:
        if self.size_mode == "fixed":
            # ref Slide :36: plain int() truncation, NOT +0.5 rounding
            return int(self.fixed_hw[0] * scale), int(self.fixed_hw[1] * scale)
        long_size = int(self.base_size * scale + 0.5)  # ref CTS/PC :58
        if h > w:
            return long_size, int(w * long_size / h + 0.5)
        return int(h * long_size / w + 0.5), long_size

    def _infer(self, img: jnp.ndarray, flip: bool) -> jnp.ndarray:
        """Flip-averaged exp(logits) (ref CTS inference :29-53)."""
        pred = self.apply_fn(img)
        if flip:
            pred_f = jnp.flip(self.apply_fn(jnp.flip(img, axis=2)), axis=2)
            pred = (pred + pred_f) * 0.5
        return jnp.exp(pred)

    def _pad_to(self, img: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
        """Pad bottom/right with pad_value (ref PC pad_image :70-79)."""
        _, h, w, _ = img.shape
        if ph <= h and pw <= w:
            return img
        pv = jnp.asarray(self.pad_value, jnp.float32)
        canvas = jnp.zeros((1, max(ph, h), max(pw, w), 3), jnp.float32) + pv
        return jax.lax.dynamic_update_slice(canvas, img, (0, 0, 0, 0))

    def _batched_infer(self, crops: jnp.ndarray, flip: bool,
                       ch: int, cw: int) -> jnp.ndarray:
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
            return self._infer(crops, flip)[:n]
        # fixed-size chunks: always pad up to crop_chunk — a min(chunk, n)
        # here would compile an extra model program per distinct small grid
        # size, defeating the shared-compile design
        chunk = self.crop_chunk
        pad = (-n) % chunk
        if pad:
            crops = jnp.concatenate(
                [crops, jnp.zeros((pad, ch, cw, 3), crops.dtype)], axis=0)
        return jnp.concatenate(
            [self._infer(crops[i:i + chunk], flip)
             for i in range(0, n + pad, chunk)], axis=0)[:n]

    def _slide(self, img: jnp.ndarray, flip: bool) -> jnp.ndarray:
        """Batched sliding-window inference over one (1,H,W,3) image.

        The model only ever sees fixed (chunk, ech, ecw, 3) batches, so its
        (expensive) compile is shared across every image shape at the same
        effective crop; gather/scatter compile per shape but are trivial
        scan programs.  Returns the count-normalised canvas at the image's
        (possibly pre-padded) size — the caller slices back."""
        _, h, w, _ = img.shape
        ch, cw = self.crop_size
        if self.grid_mode == "pad":
            # PC: image pre-padded to >= crop per dim by the caller; grid
            # origins unclamped, so pad the canvas to the grid extent and
            # gather full-size crops from it (identical bytes to upstream's
            # per-crop pad_image, since the pad value matches)
            rows, cols = _grid_rows_cols(h, w, (ch, cw), self.strides)
            gh = (rows - 1) * self.strides[0] + ch
            gw = (cols - 1) * self.strides[1] + cw
            img_g = self._pad_to(img, gh, gw)
            origins = np.asarray(
                _crop_grid(h, w, (ch, cw), self.strides, clamp=False),
                np.int32)
            crops = _gather_crops(img_g, jnp.asarray(origins), ch, cw)
            preds = self._batched_infer(crops, flip, ch, cw)
            return _scatter_add(preds, jnp.asarray(origins), gh, gw,
                                ch, cw, self.num_classes)[:, :h, :w]
        # clamp mode: effective crop = min(crop, image) per dim — small
        # scaled images reach the model at their natural size, exactly as
        # upstream's clamped h0:h1 slicing produces (TTA_wrapper_CTS:117-124)
        ech, ecw = min(ch, h), min(cw, w)
        origins = np.asarray(
            _crop_grid(h, w, (ech, ecw), self.strides, clamp=True), np.int32)
        crops = _gather_crops(img, jnp.asarray(origins), ech, ecw)
        preds = self._batched_infer(crops, flip, ech, ecw)
        return _scatter_add(preds, jnp.asarray(origins), h, w,
                            ech, ecw, self.num_classes)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (1, H, W, 3) normalised image -> (1, H, W, C) accumulated probs."""
        _, ori_h, ori_w, _ = x.shape
        ch, cw = self.crop_size
        final = jnp.zeros((1, ori_h, ori_w, self.num_classes), jnp.float32)
        # 'both': scales x [flip-averaged, unflipped] product (ref Slide
        # :31-38, honouring the flip flag); 'avg': one flip-averaged pass
        # (CTS/PC)
        if self.flip_mode == "both":
            flip_entries = [True, False] if self.flip else [False]
        else:
            flip_entries = [self.flip]
        for scale in self.scales:
            nh, nw = self._scaled_hw(ori_h, ori_w, scale)
            img = resize_bilinear(x, (nh, nw), align_corners=False)  # cv2 rule
            for fl in flip_entries:
                if self.whole_image == "scale_lt_1" and scale < 1.0:
                    # ref CTS :103-109: whole image, flip hardcoded True,
                    # NO padding even below crop size
                    preds = self._infer(img, True)
                elif (self.whole_image == "fits_crop"
                      and max(nh, nw) <= min(ch, cw)):
                    # ref PC :109-115: pad to crop, infer, slice back
                    preds = self._infer(self._pad_to(img, ch, cw),
                                        True)[:, :nh, :nw]
                else:
                    img_s = img
                    if self.grid_mode == "pad" and (nh < ch or nw < cw):
                        # ref PC :118-121: pre-pad short dims to crop
                        img_s = self._pad_to(img, max(nh, ch), max(nw, cw))
                    # PC passes flip=True on every call (:150); others use
                    # the entry's flip
                    preds = self._slide(
                        img_s, True if self.grid_mode == "pad" else fl)
                    preds = preds[:, :nh, :nw]
                final = final + resize_bilinear(preds, (ori_h, ori_w),
                                                self.align_corners)
        return final


def build_tta(apply_fn, config: dict, num_classes: int, mesh=None):
    """Dataset-dispatched TTA construction (ref BaseManager.py:620-634):
    CITYSCAPES -> CTS protocol; PASCALC -> PC protocol; ADE20K WITH a
    top-level 'strides' key -> Slide protocol; anything else -> the base
    whole-image wrapper."""
    dataset = config["data"]["dataset"]
    # debug mode forces single-scale TTA regardless of tta_scales
    # (ref BaseManager.py:616-618)
    scales = ([1.0] if config.get("debugging")
              else config.get("tta_scales", [0.75, 1.25, 1.5, 1.75, 2.0]))
    align = config["graph"].get("align_corners", True)
    flip = config.get("flip", True)
    base = config.get("tta_base_size")  # protocol default per dataset below
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    tv = config["data"].get("transform_values", {})
    if dataset == "CITYSCAPES":
        crop = tv.get("crop_shape", [512, 1024])
        return SlidingWindowTTA(
            apply_fn, num_classes, scales, flip=flip, crop_size=crop,
            strides=config.get("strides", crop), base_size=base or 2048,
            size_mode="long", grid_mode="clamp", flip_mode="avg",
            whole_image="scale_lt_1", align_corners=align, mesh=mesh)
    if dataset == "PASCALC":
        return SlidingWindowTTA(
            apply_fn, num_classes, scales, flip=True, crop_size=[512, 512],
            strides=[int(512 * 2 / 3)] * 2, base_size=base or 520,
            size_mode="long", grid_mode="pad", flip_mode="avg",
            whole_image="fits_crop", align_corners=align,
            pad_value=-mean / std, mesh=mesh)
    if dataset == "ADE20K" and "strides" in config:
        crop = tv.get("crop_shape", [512, 512])
        # img_scale (2048, 512) from ref TTAWrapperSlide.py:28-39;
        # tta_img_scale overrides it for test-sized walks (RUNBOOK dry-run)
        return SlidingWindowTTA(
            apply_fn, num_classes, scales, flip=flip, crop_size=crop,
            strides=config["strides"], base_size=base or 512,
            size_mode="fixed",
            fixed_hw=tuple(config.get("tta_img_scale", (2048, 512))),
            grid_mode="clamp", flip_mode="both", whole_image="never",
            align_corners=align, mesh=mesh)
    return TTAWrapper(apply_fn, num_classes, scales, flip=flip,
                      align_corners=align)
