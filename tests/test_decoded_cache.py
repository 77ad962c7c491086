"""Decoded-record cache: hit/miss behavior, parity, invalidation.

The cache must be transparent — identical records with and without it —
and must stop calling the decoders after the first epoch
(mscs_tpu/data/cache.py).
"""
import os
import time

import numpy as np
import pytest
from PIL import Image

from mscs_tpu.data import datasets as ds_mod
from mscs_tpu.data.cache import DecodedCache
from mscs_tpu.data.datasets import Cityscapes

EMPTY_TF = {"common": [], "img": [], "lbl": []}


@pytest.fixture
def fake_cts_root(tmp_path):
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "leftImg8bit" / "val" / "town"
    lbl_dir = tmp_path / "gtFine" / "val" / "town"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(3):
        img = rng.integers(0, 256, (32, 64, 3), np.uint8)
        lbl = rng.integers(0, 34, (32, 64), np.uint8)
        name = f"town_{i:06d}_000019"
        Image.fromarray(img).save(img_dir / f"{name}_leftImg8bit.png")
        Image.fromarray(lbl).save(lbl_dir / f"{name}_gtFine_labelIds.png")
    return str(tmp_path)


def test_cache_transparent(fake_cts_root, tmp_path):
    plain = Cityscapes(fake_cts_root, EMPTY_TF, split="val")
    cached = Cityscapes(fake_cts_root, EMPTY_TF, split="val",
                        decoded_cache_dir=str(tmp_path / "cache"))
    for _ in range(2):  # epoch 1 populates, epoch 2 serves memmaps
        for i in range(len(plain)):
            ip, lp, _ = plain[i]
            ic, lc, _ = cached[i]
            np.testing.assert_array_equal(ip, ic)
            np.testing.assert_array_equal(lp, lc)


def test_cache_skips_decode_after_first_epoch(fake_cts_root, tmp_path,
                                              monkeypatch):
    calls = {"img": 0, "lbl": 0}
    real_img, real_lbl = ds_mod.load_image, ds_mod.load_label
    monkeypatch.setattr(ds_mod, "load_image",
                        lambda p: (calls.__setitem__("img", calls["img"] + 1),
                                   real_img(p))[1])
    monkeypatch.setattr(ds_mod, "load_label",
                        lambda p: (calls.__setitem__("lbl", calls["lbl"] + 1),
                                   real_lbl(p))[1])
    ds = Cityscapes(fake_cts_root, EMPTY_TF, split="val",
                    decoded_cache_dir=str(tmp_path / "cache"))
    n = len(ds)
    for _ in range(3):
        for i in range(n):
            ds[i]
    assert calls == {"img": n, "lbl": n}  # first epoch only


def test_cache_invalidates_on_source_change(tmp_path):
    src = tmp_path / "x.npy"
    np.save(src, np.arange(4))
    cache = DecodedCache(str(tmp_path / "cache"))
    decodes = []

    def decode():
        decodes.append(1)
        return np.load(src)

    np.testing.assert_array_equal(cache.get(src, decode), np.arange(4))
    cache.get(src, decode)
    assert len(decodes) == 1
    time.sleep(0.01)  # ensure a distinct mtime_ns
    np.save(src, np.arange(5))
    np.testing.assert_array_equal(cache.get(src, decode), np.arange(5))
    assert len(decodes) == 2


def test_transforms_accept_readonly_inputs():
    """Epoch-2+ cache hits are read-only memmaps; every shipped transform
    must copy rather than mutate in place (contract documented on
    apply_transforms).  Runs the full train pipeline on read-only arrays —
    an in-place transform would raise 'assignment destination is
    read-only' here."""
    from mscs_tpu.data.transforms import (apply_transforms,
                                          parse_transform_lists)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (48, 96, 3), np.uint8)
    lbl = rng.integers(0, 20, (48, 96), np.uint8)
    img.setflags(write=False)
    lbl.setflags(write=False)
    td = parse_transform_lists(
        ["flip", "random_scale", "RandomCropImgLbl", "colorjitter", "blur",
         "torchvision_normalise"],
        {"crop_shape": [32, 32], "scale_range": [0.5, 2.0],
         "crop_class_max_ratio": 0.75}, "CITYSCAPES", 1)
    out_img, out_lbl, _ = apply_transforms(img, lbl, td, {"index": 0})
    assert out_img.shape[:2] == (32, 32) and out_lbl.shape == (32, 32)


def test_cache_survives_corrupt_entry(tmp_path):
    cache = DecodedCache(str(tmp_path / "cache"))
    src = tmp_path / "y.bin"
    src.write_bytes(b"src")
    arr = np.arange(6).reshape(2, 3)
    cache.get(src, lambda: arr)
    (entry,) = [f for f in os.listdir(cache.cache_dir) if f.endswith(".npy")]
    path = os.path.join(cache.cache_dir, entry)
    with open(path, "wb") as f:
        f.write(b"\x93NUMPY corrupt")
    np.testing.assert_array_equal(cache.get(src, lambda: arr), arr)
    # and the repaired entry now serves hits
    np.testing.assert_array_equal(
        cache.get(src, lambda: (_ for _ in ()).throw(AssertionError)), arr)
