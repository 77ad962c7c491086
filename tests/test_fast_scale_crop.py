"""FastScaleCrop (fused random_scale+crop) vs the reference-exact ops:
same windows must produce (near-)identical pixels, and the parser fusion
must be config-gated."""
import numpy as np
import pytest
from PIL import Image

from mscs_tpu.data.transforms import (FastScaleCrop, RandomCropImgLbl,
                                      RandomResize, parse_transform_lists,
                                      seed_transform_rng)


def _record(rng, h=200, w=300):
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    blocks = rng.integers(0, 19, (h // 50 + 1, w // 50 + 1))
    lbl = np.kron(blocks, np.ones((50, 50), np.int64))[:h, :w]
    return img, lbl.astype(np.uint8)


def test_window_equals_resize_then_crop(rng_np):
    """Cropping the resized image == resizing the (fractional) window: PIL's
    box= argument computes the identical sampling grid."""
    img, lbl = _record(rng_np)
    h, w = lbl.shape
    wr, hr = 1.37, 1.21
    new_w, new_h = int(w * wr), int(h * hr)
    th, tw = 96, 128
    i, j = 31, 57

    # slow: full resize then integer crop
    img_r = np.asarray(Image.fromarray(img).resize((new_w, new_h),
                                                   Image.BILINEAR))
    slow = img_r[i:i + th, j:j + tw]
    lbl_r = np.asarray(Image.fromarray(lbl).resize((new_w, new_h),
                                                   Image.NEAREST))
    slow_lbl = lbl_r[i:i + th, j:j + tw]

    # fast: fractional window resize
    fx, fy = w / new_w, h / new_h
    box = (j * fx, i * fy, (j + tw) * fx, (i + th) * fy)
    fast = np.asarray(Image.fromarray(img).resize((tw, th), Image.BILINEAR,
                                                  box=box))
    fast_lbl = np.asarray(Image.fromarray(lbl).resize((tw, th), Image.NEAREST,
                                                      box=box))
    # bilinear: identical sample positions, tiny quantisation differences
    diff = np.abs(fast.astype(np.int32) - slow.astype(np.int32))
    assert np.mean(diff) < 1.0 and np.percentile(diff, 99) <= 2
    # nearest: sample positions may round across a texel boundary on a
    # measure-zero set of rows/cols
    assert np.mean(fast_lbl != slow_lbl) < 0.05


def test_fast_scale_crop_output_contract(rng_np):
    t = FastScaleCrop("CITYSCAPES", 1, (128, 128), scale_range=(0.75, 2.0),
                      crop_class_max_ratio=0.75)
    for k in range(5):
        img, lbl = _record(rng_np, 180 + k * 17, 260 + k * 11)
        meta = {}
        out_img, out_lbl, out_meta = t((img, lbl, meta))
        assert out_img.shape == (128, 128, 3)
        assert out_lbl.shape == (128, 128)
        assert "crop_ijhw" in out_meta


def test_fast_scale_crop_small_scale_fallback(rng_np):
    """Scales that shrink below the crop go through the reference pad path
    (random-position pad with the ignore class)."""
    seed_transform_rng(0)
    t = FastScaleCrop("CITYSCAPES", 1, (256, 256), scale_range=(0.5, 0.5),
                      aspect_range=(1.0, 1.0))
    img, lbl = _record(rng_np, 200, 300)  # 0.5x -> 100x150 < 256
    out_img, out_lbl = t((img, lbl))[:2]
    assert out_img.shape == (256, 256, 3)
    assert (out_lbl == t.ignore_class).any()  # ignore-padded


def test_parser_fusion_gate():
    tv = {"crop_shape": [64, 64], "scale_range": [0.5, 2.0],
          "crop_class_max_ratio": 0.75}
    td = parse_transform_lists(["flip", "random_scale", "RandomCropImgLbl",
                                "torchvision_normalise"], tv, "CITYSCAPES", 1)
    kinds = [type(t).__name__ for t in td["common"]]
    assert "FastScaleCrop" in kinds
    assert "RandomResize" not in kinds and "RandomCropImgLbl" not in kinds

    td = parse_transform_lists(
        ["flip", "random_scale", "RandomCropImgLbl", "torchvision_normalise"],
        dict(tv, fast_scale_crop=False), "CITYSCAPES", 1)
    kinds = [type(t).__name__ for t in td["common"]]
    assert kinds.count("RandomResize") == 1
    assert kinds.count("RandomCropImgLbl") == 1
    assert "FastScaleCrop" not in kinds


def test_scale_distribution_matches_reference_pair(rng_np):
    """Mean label-class distribution over many fused crops matches the
    reference two-op pipeline (same augmentation distribution)."""
    seed_transform_rng(1)
    img, lbl = _record(rng_np, 256, 256)
    fast = FastScaleCrop("CITYSCAPES", 1, (96, 96), scale_range=(0.75, 1.5))
    slow_rs = RandomResize("CITYSCAPES", 1, scale_range=(0.75, 1.5),
                           target_size=(96, 96))
    slow_crop = RandomCropImgLbl("CITYSCAPES", 1, (96, 96))
    n = 600
    hist_fast = np.zeros(20)
    hist_slow = np.zeros(20)
    for _ in range(n):
        _, lf = fast((img, lbl))[:2]
        hist_fast += np.bincount(np.asarray(lf, np.int64).ravel(),
                                 minlength=20)[:20]
        _, ls = slow_crop(slow_rs((img, lbl)))[:2]
        hist_slow += np.bincount(np.asarray(ls, np.int64).ravel(),
                                 minlength=20)[:20]
    pf, ps = hist_fast / hist_fast.sum(), hist_slow / hist_slow.sum()
    assert np.abs(pf - ps).max() < 0.03  # same class-frequency distribution


def test_ext_random_scale_and_df_builder(tmp_path):
    """Dormant-extras parity: ExtRandomScale (log2-uniform paired jitter,
    ref torch_transforms.py:8-30) + the CaDIS table builder
    (ref df_from_data.py)."""
    import numpy as np
    from mscs_tpu.data.transforms import ExtRandomScale, parse_transform_lists
    from mscs_tpu.data.df_builder import build_cadis_records, write_cadis_csv

    t = ExtRandomScale("CADIS", 1, scale_range=(0.5, 2.0))
    img = np.random.default_rng(0).integers(0, 255, (40, 60, 3),
                                            dtype=np.uint8)
    lbl = np.random.default_rng(1).integers(0, 8, (40, 60)).astype(np.int32)
    seed_transform_rng(0)
    out_img, out_lbl = t((img, lbl))
    assert out_img.shape[:2] == out_lbl.shape
    r = out_lbl.shape[0] / 40
    assert 0.5 - 1e-6 <= r <= 2.0 + 1e-6
    assert set(np.unique(out_lbl)) <= set(np.unique(lbl))  # NEAREST only

    td = parse_transform_lists(["ext_random_scale"], {"scale_range": [0.9, 1.1]},
                               "CADIS", 1)
    assert any(isinstance(x, ExtRandomScale) for x in td["common"])

    # df builder: fake CaDIS tree
    for vid in ("Video01", "Video12"):
        for sub in ("Images", "Labels"):
            (tmp_path / vid / sub).mkdir(parents=True)
        for i in range(2):
            (tmp_path / vid / "Images" / f"frame{i}.png").touch()
            (tmp_path / vid / "Labels" / f"frame{i}.png").touch()
    records = build_cadis_records(tmp_path)
    assert [r[0] for r in records] == [1, 1, 12, 12]
    assert records[0][1] == "Video01/Images/frame0.png"
    assert records[0][2] == "Video01/Labels/frame0.png"
    out_csv = tmp_path / "data.csv"
    write_cadis_csv(records, out_csv)
    import pandas as pd
    df = pd.read_csv(out_csv)
    assert list(df.columns) == ["vid_num", "img_path", "lbl_path"]
    assert len(df) == 4
