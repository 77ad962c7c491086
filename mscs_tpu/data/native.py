"""ctypes bindings for the native host-augmentation library.

``native/aug_ops.cpp`` provides GIL-free C++/OpenMP kernels for the loader's
hot loops (class-capped crop search, color jitter, label downsample, fused
float-normalise).  Auto-builds with g++ on first use; every entry point has
a numpy fallback, so the pipeline works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _repo_root() -> pathlib.Path:
    return pathlib.Path(__file__).resolve().parents[2]


def get_lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _repo_root() / "native" / "libaug_ops.so"
    if not so.exists():
        try:
            subprocess.run([str(_repo_root() / "native" / "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.label_nearest_downsample.argtypes = [
        i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p]
    lib.random_crop_class_cap.restype = ctypes.c_int
    lib.random_crop_class_cap.argtypes = [
        i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ctypes.c_uint64, i32p]
    lib.color_jitter.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, i32p]
    lib.to_float_normalize.argtypes = [
        u8p, ctypes.c_int64, f32p, f32p, f32p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return get_lib() is not None


def label_nearest_downsample(lbl: np.ndarray, oh: int, ow: int) -> np.ndarray:
    lib = get_lib()
    lbl = np.ascontiguousarray(lbl, np.int32)
    if lib is None:
        hi = (np.arange(oh) * lbl.shape[0] // oh)
        wi = (np.arange(ow) * lbl.shape[1] // ow)
        return lbl[hi][:, wi]
    out = np.empty((oh, ow), np.int32)
    lib.label_nearest_downsample(lbl, lbl.shape[0], lbl.shape[1], oh, ow, out)
    return out


def random_crop_class_cap(lbl: np.ndarray, crop_hw, num_classes: int,
                          ignore_cls: int, max_ratio: float, patience: int,
                          seed: int):
    """Returns ((i, j), accepted)."""
    lib = get_lib()
    lbl = np.ascontiguousarray(lbl, np.int32)
    if lib is None:
        return None  # caller falls back to the numpy search
    out = np.zeros((2,), np.int32)
    acc = lib.random_crop_class_cap(
        lbl, lbl.shape[0], lbl.shape[1], int(crop_hw[0]), int(crop_hw[1]),
        int(num_classes), int(ignore_cls), float(max_ratio), int(patience),
        np.uint64(seed & 0xFFFFFFFFFFFFFFFF), out)
    return (int(out[0]), int(out[1])), bool(acc)


def color_jitter(img: np.ndarray, brightness: float, contrast: float,
                 saturation: float, hue: float,
                 order: np.ndarray) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    lib.color_jitter(img, img.shape[0], img.shape[1], float(brightness),
                     float(contrast), float(saturation), float(hue),
                     np.ascontiguousarray(order, np.int32))
    return img


def to_float_normalize(img: np.ndarray, mean: np.ndarray,
                       std: np.ndarray) -> np.ndarray:
    lib = get_lib()
    img = np.ascontiguousarray(img, np.uint8)
    if lib is None:
        return (img.astype(np.float32) / 255.0 - mean) / std
    out = np.empty(img.shape, np.float32)
    lib.to_float_normalize(img, img.shape[0] * img.shape[1],
                           np.ascontiguousarray(mean, np.float32),
                           np.ascontiguousarray(std, np.float32), out)
    return out
