"""Native augmentation kernels vs numpy/PIL references."""
import numpy as np
import pytest

from mscs_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def test_label_downsample_matches_numpy(rng_np):
    lbl = rng_np.integers(0, 20, (96, 160)).astype(np.int32)
    for scale in (2, 4, 8):
        oh, ow = 96 // scale, 160 // scale
        got = native.label_nearest_downsample(lbl, oh, ow)
        hi = np.arange(oh) * 96 // oh
        wi = np.arange(ow) * 160 // ow
        np.testing.assert_array_equal(got, lbl[hi][:, wi])


def test_crop_class_cap_semantics(rng_np):
    lbl = np.zeros((64, 64), np.int32)
    lbl[:, 32:] = 1  # two balanced classes -> any crop spanning both accepts
    (i, j), acc = native.random_crop_class_cap(
        lbl, (32, 32), num_classes=19, ignore_cls=19, max_ratio=0.75,
        patience=10, seed=42)
    assert 0 <= i <= 32 and 0 <= j <= 32
    if acc:
        crop = lbl[i:i + 32, j:j + 32]
        cnt = np.bincount(crop.reshape(-1), minlength=20)[:19]
        cnt = cnt[cnt > 0]
        assert len(cnt) > 1 and cnt.max() / cnt.sum() < 0.75


def test_crop_all_one_class_never_accepts():
    lbl = np.zeros((64, 64), np.int32)
    out = native.random_crop_class_cap(lbl, (32, 32), 19, 19, 0.75, 10, 7)
    (i, j), acc = out
    assert not acc  # single class can never satisfy the cap


def test_to_float_normalize_matches_numpy(rng_np):
    img = rng_np.integers(0, 256, (33, 47, 3)).astype(np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    got = native.to_float_normalize(img, mean, std)
    want = (img.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_color_jitter_brightness_saturation(rng_np):
    img = rng_np.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    # identity factors change nothing
    out = native.color_jitter(img.copy(), 1.0, 1.0, 1.0, 0.0,
                              np.array([0, 1, 2, 3], np.int32))
    np.testing.assert_array_equal(out, img)
    # brightness 1.5 scales like PIL Brightness.enhance
    out = native.color_jitter(img.copy(), 1.5, 1.0, 1.0, 0.0,
                              np.array([0, 1, 2, 3], np.int32))
    want = np.clip(img.astype(np.float32) * 1.5 + 0.5, 0, 255).astype(np.uint8)
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1
