"""TTA semantics: sliding-window count normalisation, flip equivariance,
whole-image multi-scale averaging."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mscs_tpu.models.tta import SlidingWindowTTA, TTAWrapper, _crop_grid


def test_crop_grid_covers_and_clamps():
    grid = _crop_grid(96, 128, (64, 64), (48, 48))
    arr = np.zeros((96, 128))
    for h0, w0 in grid:
        assert h0 + 64 <= 96 and w0 + 64 <= 128
        arr[h0:h0 + 64, w0:w0 + 64] += 1
    assert (arr > 0).all()  # full coverage


def _identity_model(num_classes):
    """'Model' whose logits encode the input mean per pixel — deterministic,
    resolution-preserving, flip-equivariant."""
    def apply_fn(x):
        base = jnp.mean(x, axis=-1, keepdims=True)
        return jnp.tile(base, (1, 1, 1, num_classes))
    return apply_fn


def test_sliding_window_count_normalisation(rng_np):
    c = 4
    tta = SlidingWindowTTA(_identity_model(c), c, scales=[1.0], flip=False,
                           crop_size=(32, 32), strides=(24, 24), base_size=64,
                           size_mode="long")
    x = jnp.asarray(rng_np.standard_normal((1, 64, 64, 3)), jnp.float32)
    out = tta(x)
    # overlap-normalised exp(pred) of an input-dependent model must equal
    # the whole-image exp(pred) wherever crops tile exactly
    want = jnp.exp(_identity_model(c)(x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_whole_image_tta_flip_consistency(rng_np):
    c = 3
    tta = TTAWrapper(_identity_model(c), c, scales=[1.0], flip=True)
    x = jnp.asarray(rng_np.standard_normal((1, 32, 48, 3)), jnp.float32)
    out = tta(x)
    # flip-equivariant model => TTA == plain forward
    want = _identity_model(c)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_multi_scale_accumulation_shape(rng_np):
    c = 5
    tta = SlidingWindowTTA(_identity_model(c), c, scales=[0.5, 1.0],
                           flip=True, crop_size=(32, 32), base_size=64,
                           size_mode="long")
    x = jnp.asarray(rng_np.standard_normal((1, 48, 64, 3)), jnp.float32)
    out = tta(x)
    assert out.shape == (1, 48, 64, c)
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(out) > 0).all()  # sum of exp() terms


def test_sliding_window_sharded_matches_unsharded(rng_np):
    """Crop batches sharded over the 8-device mesh give identical results."""
    import jax
    from mscs_tpu.parallel import make_mesh
    c = 4
    x = jnp.asarray(rng_np.standard_normal((1, 64, 64, 3)), jnp.float32)
    kw = dict(scales=[1.0], flip=True, crop_size=(32, 32), strides=(24, 24),
              base_size=64, size_mode="long")
    plain = SlidingWindowTTA(_identity_model(c), c, **kw)(x)
    sharded = SlidingWindowTTA(_identity_model(c), c, mesh=make_mesh(), **kw)(x)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain),
                               rtol=1e-5, atol=1e-6)
