"""Golden numerical regression values.

The reference's de-facto numeric anchor is a pickled-label __main__ block
printing a loss for a fixed seed (DenseContrastiveLossV2.py:209-241).  Here:
deterministic synthetic inputs with fixed seeds and recorded fp32 outputs —
catches silent numeric drift across refactors/rounds.  CPU-backend values
(conftest forces cpu); tolerances cover cross-CPU fp32 variation.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mscs_tpu.losses import (
    DenseContrastiveLossV2_ms,
    LossWrapper,
    cross_entropy,
    lovasz_softmax,
)
from mscs_tpu.ops import masked_infonce, sample_anchors


def _det_label_feats(n=2, hw=64, d=16, num_classes=20, seed=7):
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, num_classes, (n, hw // 8, hw // 8))
    label = np.kron(blocks, np.ones((8, 8), np.int64)).astype(np.int32)
    feats = [rng.standard_normal((n, hw // s, hw // s, d)).astype(np.float32)
             for s in (4, 8, 16, 32)]
    return jnp.asarray(label), [jnp.asarray(f) for f in feats]


def test_golden_infonce_value():
    rng = np.random.default_rng(11)
    m, c = 256, 16
    labels = jnp.asarray(np.repeat(np.arange(8), 32), jnp.int32)
    feats = jnp.asarray(rng.standard_normal((m, c)), jnp.float32)
    valid = jnp.ones((m,), bool)
    loss = float(masked_infonce(feats, labels, valid, temperature=0.1))
    np.testing.assert_allclose(loss, 8.0674906, rtol=1e-4)


def test_golden_sampling_tv():
    label, feats = _det_label_feats()
    out = sample_anchors(jax.random.key(3),
                         jnp.asarray(np.asarray(label)[:, ::4, ::4]),
                         feats[0], num_all_classes=20,
                         max_features_total=512)
    assert (int(out.num_pairs), int(out.views)) == (29, 8)


def test_golden_dcv2_ms_loss():
    label, feats = _det_label_feats()
    loss_fn = DenseContrastiveLossV2_ms.from_config({
        "dataset": "CITYSCAPES", "experiment": 1, "temperature": 0.1,
        "scales": 4, "weights": [1, 0.7, 0.4, 0.1],
        "cross_scale_contrast": True, "max_features_total": 512})
    loss, aux = loss_fn(jax.random.key(0), label, feats)
    np.testing.assert_allclose(float(loss), 12.793917, rtol=1e-3)
    # scales 2/3 of a 64^2 label are 4^2/2^2 pixels: nothing reaches
    # min_views=5, so the graceful zero-loss path engages (exactly 0)
    np.testing.assert_allclose(
        [float(v) for v in aux["ms_losses"]],
        [8.178801, 6.593023, 0.0, 0.0], rtol=1e-3, atol=1e-7)


def test_golden_ce_and_lovasz():
    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.standard_normal((1, 16, 16, 7)), jnp.float32)
    target = jnp.asarray(rng.integers(0, 8, (1, 16, 16)), jnp.int32)
    ce = float(cross_entropy(logits, target, ignore_index=7))
    lv = float(lovasz_softmax(logits, target, ignore_index=7))
    np.testing.assert_allclose(ce, 2.3096964, rtol=1e-5)
    np.testing.assert_allclose(lv, 0.8589169, rtol=1e-4)
