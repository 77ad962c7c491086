"""Pallas fused InfoNCE vs the XLA reference path (values + gradients).

On CPU the kernels run in interpreter mode; on TPU they compile. Either way
they must match ops.infonce bit-for-bit up to fp32 reduction noise.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mscs_tpu.ops.infonce import masked_infonce, masked_infonce_cross
from mscs_tpu.ops.pallas_infonce import (
    masked_infonce_cross_pallas,
    masked_infonce_pallas,
)


def _anchors(rng, m, c, k, n_valid=None):
    n_valid = m if n_valid is None else n_valid
    f = rng.standard_normal((m, c)).astype(np.float32)
    l = rng.integers(0, k, m).astype(np.int32)
    v = np.zeros((m,), bool)
    v[:n_valid] = True
    f[~v] = 0.0
    return jnp.asarray(f), jnp.asarray(l), jnp.asarray(v)


@pytest.mark.parametrize("m,n_valid", [(512, 512), (512, 300)])
def test_pallas_self_matches_xla(m, n_valid, rng_np):
    f, l, v = _anchors(rng_np, m, 32, 7, n_valid)
    want = masked_infonce(f, l, v, temperature=0.1)
    got = masked_infonce_pallas(f, l, v, temperature=0.1)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_pallas_cross_matches_xla(rng_np):
    fa, la, va = _anchors(rng_np, 512, 16, 5, 400)
    fb, lb, vb = _anchors(rng_np, 256, 16, 5, 200)
    want = masked_infonce_cross(fa, la, va, fb, lb, vb, temperature=0.1)
    got = masked_infonce_cross_pallas(fa, la, va, fb, lb, vb, temperature=0.1)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_pallas_gradients_match_xla(rng_np):
    f, l, v = _anchors(rng_np, 256, 16, 5, 200)
    g_want = jax.grad(lambda x: masked_infonce(x, l, v, temperature=0.1))(f)
    g_got = jax.grad(lambda x: masked_infonce_pallas(x, l, v,
                                                     temperature=0.1))(f)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-4, atol=1e-6)


def test_pallas_cross_gradients_match_xla(rng_np):
    fa, la, va = _anchors(rng_np, 256, 16, 5)
    fb, lb, vb = _anchors(rng_np, 256, 16, 5)

    def loss_xla(a, b):
        return masked_infonce_cross(a, la, va, b, lb, vb, temperature=0.1)

    def loss_pl(a, b):
        return masked_infonce_cross_pallas(a, la, va, b, lb, vb,
                                           temperature=0.1)

    ga_w, gb_w = jax.grad(loss_xla, argnums=(0, 1))(fa, fb)
    ga_g, gb_g = jax.grad(loss_pl, argnums=(0, 1))(fa, fb)
    np.testing.assert_allclose(np.asarray(ga_g), np.asarray(ga_w),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb_g), np.asarray(gb_w),
                               rtol=1e-4, atol=1e-6)


def test_pallas_cross_gradients_asymmetric_m(rng_np):
    """Fused-bwd kernel with m_a != m_b and multiple row-tile grid steps:
    db must accumulate correctly across grid iterations."""
    fa, la, va = _anchors(rng_np, 512, 16, 5, 400)
    fb, lb, vb = _anchors(rng_np, 256, 16, 5, 200)

    def loss_xla(a, b):
        return masked_infonce_cross(a, la, va, b, lb, vb, temperature=0.1)

    def loss_pl(a, b):
        return masked_infonce_cross_pallas(a, la, va, b, lb, vb,
                                           temperature=0.1)

    ga_w, gb_w = jax.grad(loss_xla, argnums=(0, 1))(fa, fb)
    ga_g, gb_g = jax.grad(loss_pl, argnums=(0, 1))(fa, fb)
    np.testing.assert_allclose(np.asarray(ga_g), np.asarray(ga_w),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb_g), np.asarray(gb_w),
                               rtol=1e-4, atol=1e-6)


def test_auto_impl_never_selects_uncompilable_kernel():
    """'auto' must fall back to the streamed XLA path when the VMEM-resident
    kernel cannot fit the compiler cap at this size (ADVICE r2): a huge
    max_features_total previously auto-selected Pallas and failed to
    compile."""
    from mscs_tpu.losses.dense_contrastive import DenseContrastiveLossV2
    from mscs_tpu.ops.infonce import masked_infonce as xla_fn
    from mscs_tpu.ops.pallas_infonce import fits_vmem

    mk = lambda mft: DenseContrastiveLossV2(
        dataset="CITYSCAPES", experiment=1, max_features_total=mft)
    # paper scale: fits, auto -> pallas
    assert fits_vmem(10240, 256)
    assert mk(10000)._use_pallas(256)
    # far beyond the cap: must NOT pick pallas
    assert not fits_vmem(65536, 256)
    big = mk(65536)
    assert not big._use_pallas(256)
    assert big._infonce_fn(256) is xla_fn
    # explicit 'pallas' request is honoured (user override)
    explicit = DenseContrastiveLossV2(
        dataset="CITYSCAPES", experiment=1, max_features_total=65536,
        infonce_impl="pallas")
    assert explicit._use_pallas(256)
