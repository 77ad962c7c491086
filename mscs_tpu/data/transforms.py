"""Host-side augmentation pipeline (numpy/PIL), reference-equal semantics.

Port of the reference transform set assembled by ``parse_transform_lists``
(``utils/config_parsers.py:232-340``, ``utils/transforms.py``,
``utils/np_transforms.py``): joint img+lbl 'common' transforms first, then
img-only / lbl-only chains, ToTensor scaling and ImageNet normalisation.

Image resizes go through PIL (BILINEAR for images / NEAREST for labels) like
the reference, so train-time augmentation distributions and the eval-time
Resize metadata protocol (``sh_sw_in_out``, ``pw_ph_stride``,
``original_labels``) match exactly.  Everything returns numpy; the device
pipeline consumes NHWC float32 + int32 labels.
"""
from __future__ import annotations

import math
import threading
from typing import Any

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter

from mscs_tpu.data.datasets_info import has_ignore_class, num_all_classes

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# ---------------------------------------------------------------- aug RNG --
# All augmentation randomness draws from a THREAD-LOCAL generator seeded per
# record by the DataLoader (seed, epoch, position).  The reference reseeds
# numpy once per torch worker PROCESS (utils/utils.py:556-557); with thread
# workers a process-global np.random would be shared across threads and the
# draw order would depend on scheduling — same-seed runs could diverge under
# load (the r2/r3 test_trainer flake).  Per-record seeding is stronger:
# deterministic for any worker count, type, or interleaving.
_TLS = threading.local()


def seed_transform_rng(seed) -> None:
    """Seed this thread's augmentation RNG (called per record fetch)."""
    _TLS.rng = np.random.default_rng(seed)


def transform_rng() -> np.random.Generator:
    rng = getattr(_TLS, "rng", None)
    if rng is None:  # direct dataset[idx] use outside a DataLoader
        rng = _TLS.rng = np.random.default_rng()
    return rng


class BaseTransform:
    def __init__(self, dataset: str, experiment: int, img_pad_value: float = 0.0):
        self.dataset = dataset
        self.experiment = experiment
        self.img_pad_value = img_pad_value
        n = num_all_classes(dataset, experiment)
        # labels are padded with the (network-id) ignore class
        self.ignore_class = n - 1 if has_ignore_class(dataset, experiment) else -1
        self.label_pad_value = self.ignore_class


class FlipNP:
    """Horizontal flip with p=0.5 applied jointly (ref np_transforms.py:91-114)."""

    def __call__(self, arrs):
        img, lbl, *meta = arrs
        if transform_rng().random() < 0.5:
            img = np.ascontiguousarray(img[:, ::-1])
            lbl = np.ascontiguousarray(lbl[:, ::-1])
        return (img, lbl, *meta)


class PadNP:
    """Fixed padding (CaDIS 540x960 -> 544x960, ref np_transforms.py:8-20)."""

    def __init__(self, ver=(2, 2), hor=(0, 0), padding_mode="reflect"):
        self.ver, self.hor, self.mode = ver, hor, padding_mode

    def __call__(self, arr):
        pad = (self.ver, self.hor) + (((0, 0),) if arr.ndim == 3 else ())
        return np.pad(arr, pad, mode=self.mode)


class ExtRandomScale(BaseTransform):
    """Log2-uniform paired scale jitter (ref utils/torch_transforms.py:8-30,
    dormant there — only reachable from the legacy parser).  Unlike
    RandomResize there is no aspect jitter and no pad-to-crop: scale is
    2**U(log2(lo), log2(hi)), image BILINEAR / label NEAREST."""

    def __init__(self, dataset, experiment, scale_range=(0.5, 2.0)):
        super().__init__(dataset, experiment)
        self.scale_range = scale_range

    def __call__(self, arrs):
        img, lbl, *meta = arrs
        lo, hi = self.scale_range
        scale = 2.0 ** transform_rng().uniform(math.log2(lo), math.log2(hi))
        h, w = lbl.shape[:2]
        new_size = (int(round(w * scale)), int(round(h * scale)))  # PIL (W,H)
        img = np.asarray(Image.fromarray(img).resize(new_size, Image.BILINEAR))
        lbl = np.asarray(Image.fromarray(lbl.astype(np.uint8))
                         .resize(new_size, Image.NEAREST)).astype(lbl.dtype)
        return (img, lbl, *meta)


class RandomResize(BaseTransform):
    """Random scale+aspect jitter with random-position pad to crop shape
    (ref transforms.py:202-283)."""

    def __init__(self, dataset, experiment, scale_range=(0.5, 2.0),
                 aspect_range=(0.9, 1.1), probability=1.0, target_size=None):
        super().__init__(dataset, experiment)
        self.scale_range = scale_range
        self.aspect_range = aspect_range
        self.probability = probability
        self.target_size = None if target_size is None else tuple(target_size[::-1])

    def __call__(self, arrs):
        img, lbl, *meta = arrs
        if transform_rng().random() < self.probability:
            scale = transform_rng().uniform(*self.scale_range)
            aspect = transform_rng().uniform(*self.aspect_range)
            wr = math.sqrt(aspect) * scale
            hr = math.sqrt(1.0 / aspect) * scale
            h, w = lbl.shape[:2]
            new_size = (int(w * wr), int(h * hr))  # PIL (W, H)
            img = np.asarray(Image.fromarray(img).resize(new_size, Image.BILINEAR))
            lbl = np.asarray(Image.fromarray(lbl.astype(np.uint8))
                             .resize(new_size, Image.NEAREST)).astype(lbl.dtype)
            if self.target_size is not None:
                pad_w = self.target_size[0] - new_size[0]
                pad_h = self.target_size[1] - new_size[1]
                if pad_w > 0 or pad_h > 0:
                    rng = transform_rng()
                    cp = int(rng.integers(0, pad_w + 1)) if pad_w > 0 else 0
                    rp = int(rng.integers(0, pad_h + 1)) if pad_h > 0 else 0
                    pi = ((rp, max(0, pad_h - rp)), (cp, max(0, pad_w - cp)))
                    img = np.pad(img, pi + ((0, 0),), mode="constant",
                                 constant_values=self.img_pad_value)
                    lbl = np.pad(lbl, pi, constant_values=self.label_pad_value)
        return (img, lbl, *meta)


class FastScaleCrop(BaseTransform):
    """Fused RandomResize + RandomCropImgLbl with the SAME sampling
    distribution but ~(scale * image/crop)^2 less resize work.

    The reference resizes the full image (up to 2048x4096 at scale 2) and
    then crops 512^2 (transforms.py:202-283 + :49-108).  Only the cropped
    window ever reaches the model, so this computes the equivalent: sample
    the same scale/aspect/origin in resized coordinates, then crop+resize
    just that window via PIL's fractional ``box=`` (exact subpixel math).
    Crop retries (class-ratio cap) re-evaluate only the 512^2 NEAREST label
    window.  When the resized image is smaller than the crop, it falls back
    to the reference ops verbatim (resize + random-position pad + crop).

    Distribution-equivalent, not rng-stream-equivalent, to the reference
    pair; disable with ``transform_values['fast_scale_crop'] = false``.
    """

    def __init__(self, dataset, experiment, crop_shape,
                 scale_range=(0.5, 2.0), aspect_range=(0.9, 1.1),
                 probability=1.0, crop_class_max_ratio=None):
        super().__init__(dataset, experiment)
        self.crop_shape = tuple(crop_shape)  # (H, W)
        self.scale_range = scale_range
        self.aspect_range = aspect_range
        self.probability = probability
        self.crop_class_max_ratio = crop_class_max_ratio
        self.patience = 10

    def _label_window(self, lbl_img, box, th, tw):
        win = lbl_img.resize((tw, th), Image.NEAREST, box=box)
        return np.asarray(win)

    def _ratio_ok(self, lbl_crop) -> bool:
        classes, cnt = np.unique(lbl_crop, return_counts=True)
        cnt = cnt[classes != self.ignore_class]
        return (len(cnt) > 1
                and cnt.max() / cnt.sum() < self.crop_class_max_ratio)

    def __call__(self, arrs):
        img, lbl, *meta = arrs
        th, tw = self.crop_shape
        h, w = lbl.shape[:2]
        if transform_rng().random() < self.probability:
            scale = transform_rng().uniform(*self.scale_range)
            aspect = transform_rng().uniform(*self.aspect_range)
            wr = math.sqrt(aspect) * scale
            hr = math.sqrt(1.0 / aspect) * scale
        else:
            wr = hr = 1.0
        new_w, new_h = int(w * wr), int(h * hr)  # resized-coordinate size
        if new_h < th or new_w < tw:
            # small-scale path: the reference pads the resized image to crop
            # shape with a random offset — cheap at these sizes, keep exact
            rs = RandomResize(self.dataset, self.experiment,
                              scale_range=(scale, scale) if hr != 1.0 else (1, 1),
                              aspect_range=(aspect, aspect) if hr != 1.0 else (1, 1),
                              probability=1.0 if hr != 1.0 else 0.0,
                              target_size=(th, tw))
            crop = RandomCropImgLbl(self.dataset, self.experiment,
                                    self.crop_shape,
                                    self.crop_class_max_ratio)
            return crop(rs(arrs))

        # window-crop path: origin uniform in resized coords, exactly like
        # RandomCropImgLbl on the resized image
        img_pil = Image.fromarray(img)
        lbl_pil = Image.fromarray(lbl if lbl.dtype == np.uint8
                                  else lbl.astype(np.uint8))
        fx, fy = w / new_w, h / new_h  # resized px -> original px

        def sample_box():
            i = int(transform_rng().integers(0, new_h - th + 1))
            j = int(transform_rng().integers(0, new_w - tw + 1))
            return i, j, (min(j * fx, w), min(i * fy, h),
                          min((j + tw) * fx, w), min((i + th) * fy, h))

        i, j, box = sample_box()
        lbl_crop = self._label_window(lbl_pil, box, th, tw)
        if self.crop_class_max_ratio:
            for _ in range(self.patience - 1):
                if self._ratio_ok(lbl_crop):
                    break
                i, j, box = sample_box()
                lbl_crop = self._label_window(lbl_pil, box, th, tw)
        img_crop = np.asarray(
            img_pil.resize((tw, th), Image.BILINEAR, box=box))
        lbl_crop = lbl_crop.astype(lbl.dtype)
        if meta:
            meta[0]["crop_ijhw"] = [i, j, th, tw]
        return (np.ascontiguousarray(img_crop),
                np.ascontiguousarray(lbl_crop), *meta)


class RandomCropImgLbl(BaseTransform):
    """Random crop with <=10 retries enforcing a dominant-class frequency cap
    (ref transforms.py:49-108)."""

    def __init__(self, dataset, experiment, shape, crop_class_max_ratio=None):
        super().__init__(dataset, experiment)
        self.crop_shape = tuple(shape)  # (H, W)
        self.crop_class_max_ratio = crop_class_max_ratio
        self.patience = 10

    def _rand_crop_params(self, h, w):
        th, tw = self.crop_shape
        i = int(transform_rng().integers(0, max(h - th, 0) + 1))
        j = int(transform_rng().integers(0, max(w - tw, 0) + 1))
        return i, j, th, tw

    def __call__(self, arrs):
        img, lbl, *meta = arrs
        h, w = lbl.shape[:2]
        th, tw = self.crop_shape
        if h < th or w < tw:  # torchvision RandomCrop would raise; pad first
            pi = ((0, max(0, th - h)), (0, max(0, tw - w)))
            img = np.pad(img, pi + ((0, 0),), constant_values=self.img_pad_value)
            lbl = np.pad(lbl, pi, constant_values=self.label_pad_value)
            h, w = lbl.shape[:2]
        if self.crop_class_max_ratio:
            from mscs_tpu.data import native
            ch, cw = self.crop_shape
            hit = None
            if native.available():
                hit = native.random_crop_class_cap(
                    lbl, self.crop_shape,
                    num_classes=max(int(lbl.max()) + 1, self.ignore_class + 1),
                    ignore_cls=self.ignore_class,
                    max_ratio=self.crop_class_max_ratio,
                    patience=self.patience,
                    seed=int(transform_rng().integers(0, 2**62)))
            if hit is not None:
                (i, j), _ = hit
            else:
                for _ in range(self.patience):
                    i, j, ch, cw = self._rand_crop_params(h, w)
                    lbl_crop = lbl[i:i + ch, j:j + cw]
                    classes, cnt = np.unique(lbl_crop, return_counts=True)
                    cnt = cnt[classes != self.ignore_class]
                    if (len(cnt) > 1
                            and cnt.max() / cnt.sum() < self.crop_class_max_ratio):
                        break
            img = img[i:i + ch, j:j + cw]
            lbl = lbl[i:i + ch, j:j + cw]
        else:
            i, j, ch, cw = self._rand_crop_params(h, w)
            img = img[i:i + ch, j:j + cw]
            lbl = lbl[i:i + ch, j:j + cw]
        if meta:
            meta[0]["crop_ijhw"] = [i, j, ch, cw]
        return (np.ascontiguousarray(img), np.ascontiguousarray(lbl), *meta)


class Resize(BaseTransform):
    """Deterministic resize (+stride pad) with eval-un-resize metadata
    (ref transforms.py:110-199)."""

    def __init__(self, dataset, experiment, target_size=None,
                 min_side_length=None, fit_stride=8,
                 return_original_labels=False):
        super().__init__(dataset, experiment)
        assert target_size is not None or min_side_length is not None
        self.target_size = None if target_size is None else tuple(target_size[::-1])
        self.min_side_length = min_side_length
        self.fit_stride = fit_stride
        self.return_original_labels = return_original_labels

    def __call__(self, arrs):
        img, lbl, *meta_t = arrs
        metadata = meta_t[0] if meta_t else None
        h, w = lbl.shape[:2]
        if self.target_size is not None:
            target = self.target_size
            wr, hr = target[0] / w, target[1] / h
        else:
            r = self.min_side_length / min(w, h)
            wr = hr = r
            target = (int(round(w * r)), int(round(h * r)))
        if metadata is not None and self.return_original_labels:
            metadata["original_labels"] = lbl.copy()
        img = np.asarray(Image.fromarray(img).resize(target, Image.BILINEAR))
        lbl = np.asarray(Image.fromarray(lbl.astype(np.uint8))
                         .resize(target, Image.NEAREST)).astype(lbl.dtype)
        pad_cols = pad_rows = 0
        if self.fit_stride:
            s = self.fit_stride
            pad_cols = 0 if target[0] % s == 0 else s - target[0] % s
            pad_rows = 0 if target[1] % s == 0 else s - target[1] % s
            img = np.pad(img, ((0, pad_rows), (0, pad_cols), (0, 0)),
                         constant_values=self.img_pad_value)
            lbl = np.pad(lbl, ((0, pad_rows), (0, pad_cols)),
                         constant_values=self.label_pad_value)
        if metadata is not None:
            # output_shape mirrors the reference's img.shape[::-1] — a
            # (C, W, H) 3-tuple (utils/transforms.py:194); only [-2]
            # (input_size) is consumed downstream
            metadata["sh_sw_in_out"] = (hr, wr, (w, h), img.shape[::-1])
            if self.fit_stride:
                metadata["pw_ph_stride"] = (pad_cols, pad_rows, self.fit_stride)
            return img, lbl, metadata
        return img, lbl


class BlurPIL(BaseTransform):
    def __init__(self, dataset, experiment, probability=0.05,
                 kernel_limits=(3, 7)):
        super().__init__(dataset, experiment)
        self.probability = probability
        self.kernel_limits = kernel_limits

    def __call__(self, img):
        if transform_rng().random() < self.probability:
            img = np.asarray(Image.fromarray(img).filter(
                ImageFilter.GaussianBlur(
                    radius=int(transform_rng().integers(*self.kernel_limits)))))
        return img


class ColorJitter:
    """torchvision ColorJitter parity through PIL enhancers, random op order.
    Defaults = the reference recipe (config_parsers.py:300-309)."""

    def __init__(self, brightness=(2 / 3, 1.5), contrast=(2 / 3, 1.5),
                 saturation=(2 / 3, 1.5), hue=(-0.05, 0.05)):
        self.brightness, self.contrast = brightness, contrast
        self.saturation, self.hue = saturation, hue

    def __call__(self, img: np.ndarray) -> np.ndarray:
        pil = Image.fromarray(img)
        ops = [int(o) for o in transform_rng().permutation(4)]
        for op in ops:
            if op == 0:
                pil = ImageEnhance.Brightness(pil).enhance(
                    transform_rng().uniform(*self.brightness))
            elif op == 1:
                pil = ImageEnhance.Contrast(pil).enhance(
                    transform_rng().uniform(*self.contrast))
            elif op == 2:
                pil = ImageEnhance.Color(pil).enhance(
                    transform_rng().uniform(*self.saturation))
            else:
                f = transform_rng().uniform(*self.hue)
                hsv = np.asarray(pil.convert("HSV")).copy()
                hsv[..., 0] = (hsv[..., 0].astype(np.int16)
                               + int(f * 255)) % 256
                pil = Image.fromarray(hsv, "HSV").convert("RGB")
        return np.asarray(pil)


class ToFloat:
    """uint8 HWC -> float32 HWC in [0,1] (torchvision ToTensor, minus CHW)."""

    def __call__(self, img):
        return np.asarray(img, np.float32) / 255.0


class Normalize:
    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img):
        return (img - self.mean) / self.std


class ToFloatNormalize:
    """Fused ToFloat + ImageNet Normalize; uses the native C++ kernel when
    available (GIL-free, single pass over the image)."""

    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img):
        if img.dtype == np.uint8:
            from mscs_tpu.data import native
            return native.to_float_normalize(img, self.mean, self.std)
        return (np.asarray(img, np.float32) / 255.0 - self.mean) / self.std


def parse_transform_lists(transform_list: list[str],
                          transform_values: dict[str, Any],
                          dataset: str, experiment: int) -> dict[str, list]:
    """Config string lists -> transform pipelines, mirroring the reference
    parser (``utils/config_parsers.py:232-340``)."""
    d = {"dataset": dataset, "experiment": experiment}
    td: dict[str, list] = {"common": [], "img": [], "lbl": []}
    # fuse random_scale + RandomCropImgLbl into FastScaleCrop (same sampling
    # distribution, resize work proportional to the crop not the full image);
    # transform_values['fast_scale_crop']=false restores the reference ops
    fused_scale_crop = ("random_scale" in transform_list
                        and "RandomCropImgLbl" in transform_list
                        and transform_values.get("fast_scale_crop", True))
    for t in transform_list:
        if t == "flip":
            td["common"].append(FlipNP())
        elif t == "pad":
            if "crop" not in transform_list:
                for obj in ("img", "lbl"):
                    td[obj].append(PadNP(ver=(2, 2), hor=(0, 0)))
        elif t == "resize":
            td["common"].append(Resize(
                **d,
                target_size=transform_values.get("target_size"),
                min_side_length=transform_values.get("min_side_length"),
                fit_stride=transform_values.get("fit_stride")))
        elif t == "resize_val":
            td["common"].append(Resize(
                **d,
                min_side_length=transform_values["min_side_length"],
                fit_stride=transform_values["fit_stride_val"],
                return_original_labels=True))
        elif t == "random_scale":
            if fused_scale_crop:
                if not any(isinstance(x, FastScaleCrop) for x in td["common"]):
                    td["common"].append(FastScaleCrop(
                        **d,
                        crop_shape=transform_values["crop_shape"],
                        scale_range=transform_values["scale_range"],
                        aspect_range=transform_values.get("aspect_range",
                                                          [0.9, 1.1]),
                        probability=transform_values.get("p_random_scale", 1.0),
                        crop_class_max_ratio=transform_values.get(
                            "crop_class_max_ratio")))
                continue
            td["common"].append(RandomResize(
                **d,
                scale_range=transform_values["scale_range"],
                target_size=transform_values["crop_shape"],
                aspect_range=transform_values.get("aspect_range", [0.9, 1.1]),
                probability=transform_values.get("p_random_scale", 1.0)))
        elif t == "RandomCropImgLbl":
            if fused_scale_crop:
                continue  # handled by the FastScaleCrop above
            td["common"].append(RandomCropImgLbl(
                **d, shape=transform_values["crop_shape"],
                crop_class_max_ratio=transform_values.get("crop_class_max_ratio")))
        elif t == "ext_random_scale":
            td["common"].append(ExtRandomScale(
                **d, scale_range=transform_values.get("scale_range",
                                                      [0.5, 2.0])))
        elif t == "blur":
            td["img"].append(BlurPIL(**d, probability=0.05, kernel_limits=(3, 7)))
        elif t in ("colorjitter", "pseudo_colorjitter"):
            td["img"].append(ColorJitter())
        elif t == "torchvision_normalise":
            pass  # appended below, after ToFloat
        else:
            raise ValueError(f"transform {t} not recognised")
    if "torchvision_normalise" in transform_list:
        td["img"].append(ToFloatNormalize())
    else:
        td["img"].append(ToFloat())
    return td


def apply_transforms(img: np.ndarray, lbl: np.ndarray,
                     transforms_dict: dict[str, list],
                     metadata: dict | None = None):
    """Run the common/img/lbl transform pipelines on one record.

    Contract: ``img``/``lbl`` may be READ-ONLY arrays (the decoded-record
    cache serves epoch-2+ hits as read-only memmaps, data/cache.py).
    Transforms must therefore never mutate their input in place — produce
    new arrays (all shipped transforms copy).  A regression test pins this
    (tests/test_decoded_cache.py)."""
    arrs = (img, lbl, metadata) if metadata is not None else (img, lbl)
    for t in transforms_dict["common"]:
        arrs = t(arrs)
    img, lbl = arrs[0], arrs[1]
    metadata = arrs[2] if len(arrs) == 3 else None
    for t in transforms_dict["img"]:
        img = t(img)
    for t in transforms_dict["lbl"]:
        lbl = t(lbl)
    return img, np.asarray(lbl, np.int32), metadata
