"""Resize parity vs torch.nn.functional.interpolate (the reference's resizer)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from mscs_tpu.ops import resize_bilinear, resize_nearest, downsample_labels_nearest


SIZES = [
    ((1, 3, 25, 25), (193, 193)),   # HRNet logit upsample shapes
    ((2, 4, 193, 193), (769, 769)),
    ((1, 8, 17, 31), (64, 128)),
    ((2, 5, 64, 128), (17, 31)),    # downscale
    ((1, 2, 7, 7), (7, 7)),         # identity
]


@pytest.mark.parametrize("shape,out_hw", SIZES)
@pytest.mark.parametrize("align", [True, False])
def test_bilinear_matches_torch(shape, out_hw, align, rng_np):
    x = rng_np.standard_normal(shape).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=out_hw, mode="bilinear",
                         align_corners=align).numpy()
    # ours is NHWC
    got = resize_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), out_hw,
                          align_corners=align)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,out_hw", SIZES)
def test_nearest_matches_torch(shape, out_hw, rng_np):
    x = rng_np.standard_normal(shape).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=out_hw, mode="nearest").numpy()
    got = resize_nearest(jnp.asarray(x.transpose(0, 2, 3, 1)), out_hw)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("scale", [2, 4, 8, 32])
def test_label_downsample_matches_torch(scale, rng_np):
    lbl = rng_np.integers(0, 20, size=(2, 96, 160)).astype(np.int32)
    want = F.interpolate(torch.from_numpy(lbl).unsqueeze(1).float(),
                         (96 // scale, 160 // scale), mode="nearest")
    want = want.squeeze(1).long().numpy()
    got = np.asarray(downsample_labels_nearest(jnp.asarray(lbl), scale))
    np.testing.assert_array_equal(got, want)
