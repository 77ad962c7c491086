"""Anchor-sampling semantics vs an independent numpy oracle of the reference
rules (counts -> present pairs -> V selection -> per-class random sample)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mscs_tpu.ops import sample_anchors, anchor_capacity


def oracle_tv(dom: np.ndarray, k: int, min_views: int, max_views: int,
              max_feats: int):
    """Replicates the reference pair/V selection with dynamic shapes."""
    n = dom.shape[0]
    dom = dom.reshape(n, -1)
    counts = np.stack([np.bincount(d, minlength=k) for d in dom])
    present = counts[:, : k - 1] >= min_views
    pairs = [(i, c) for i in range(n) for c in range(k - 1) if present[i, c]]
    t = len(pairs)
    if t == 0:
        return 0, 0, pairs, counts
    min_count = min(counts[i, c] for i, c in pairs)
    v = min_count if max_views == 1 else min(min_count, max_views)
    if v * t > max_feats:
        v = max_feats // t
    return t, v, pairs, counts


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("caps", [(5, 2500, 10000), (5, 50, 300), (2, 1, 10000)])
def test_tv_selection_and_structure(seed, caps):
    min_views, max_views, max_feats = caps
    rng = np.random.default_rng(seed)
    n, h, w, c, k = 2, 24, 32, 8, 6
    dom = rng.integers(0, k, size=(n, h, w)).astype(np.int32)
    # make one class rare in image 0
    dom[0][dom[0] == 3] = 0
    dom[0, 0, :3] = 3  # 3 px < min_views
    feats = rng.standard_normal((n, h, w, c)).astype(np.float32)

    t_want, v_want, pairs, counts = oracle_tv(dom, k, min_views, max_views, max_feats)

    out = sample_anchors(jax.random.key(seed), jnp.asarray(dom), jnp.asarray(feats),
                         num_all_classes=k, min_views_per_class=min_views,
                         max_views_per_class=max_views,
                         max_features_total=max_feats)
    t_got, v_got = int(out.num_pairs), int(out.views)
    assert (t_got, v_got) == (t_want, v_want)

    m = t_got * v_got
    valid = np.asarray(out.valid)
    assert valid[:m].all() and not valid[m:].any()
    assert np.asarray(out.features).shape[0] == anchor_capacity(max_feats)

    labels = np.asarray(out.labels)
    f = np.asarray(out.features)
    dom_flat = dom.reshape(n, -1)
    feats_flat = feats.reshape(n, -1, c)
    for t_idx, (img, cls) in enumerate(pairs):
        sl = slice(t_idx * v_got, (t_idx + 1) * v_got)
        # slot labels follow row-major pair order
        assert (labels[sl] == cls).all()
        # each sampled feature is a real pixel of that class in that image
        cls_feats = feats_flat[img][dom_flat[img] == cls]
        for row in f[sl]:
            dists = np.abs(cls_feats - row).sum(axis=1)
            assert dists.min() < 1e-6
    # sampled pixels within one class are distinct (permutation, not iid)
    if v_got > 1:
        first = f[:v_got]
        assert len(np.unique(first.round(5), axis=0)) == v_got


def test_no_present_classes_is_safe():
    """All pixels ignore-class -> T=0, everything masked, loss path stays 0.
    (The reference crashes here — torch.min on empty; we degrade gracefully.)"""
    k = 6
    dom = jnp.full((1, 16, 16), k - 1, jnp.int32)  # everything == last class
    feats = jnp.ones((1, 16, 16, 4), jnp.float32)
    out = sample_anchors(jax.random.key(0), dom, feats, num_all_classes=k)
    assert int(out.num_pairs) == 0
    assert not np.asarray(out.valid).any()


def test_sampling_is_jittable_and_random():
    k = 8
    rng = np.random.default_rng(3)
    dom = jnp.asarray(rng.integers(0, k, size=(2, 32, 32)), jnp.int32)
    feats = jnp.asarray(rng.standard_normal((2, 32, 32, 16)), jnp.float32)
    fn = jax.jit(lambda key: sample_anchors(key, dom, feats, num_all_classes=k,
                                            max_features_total=512))
    a = fn(jax.random.key(0))
    b = fn(jax.random.key(1))
    assert int(a.num_pairs) == int(b.num_pairs)
    # different keys -> different pixel draws
    assert np.abs(np.asarray(a.features) - np.asarray(b.features)).max() > 0


def test_cadis_repeat_factors_synthetic():
    """rf(c)=max(1,sqrt(t/f)); image rf = max over present classes."""
    import pandas as pd
    from mscs_tpu.data.datasets_info import DATASETS_INFO
    from mscs_tpu.data.sampler import cadis_repeat_factors

    names = DATASETS_INFO["CADIS"].CLASS_NAMES[0]
    n = 20
    df = pd.DataFrame({name: np.zeros(n, np.int64) for name in names})
    df[names[0]] = 1000          # class 0 everywhere -> freq 1.0 -> rf 1
    df.loc[0, names[2]] = 50     # rare class only in frame 0 -> freq 0.05
    rfs = cadis_repeat_factors(df, experiment=1, repeat_thresh=0.15)
    assert rfs.shape == (n,)
    assert np.isclose(rfs[1:], 1.0).all()
    assert rfs[0] > 1.0  # the rare-class frame gets oversampled


def test_repeat_factor_indices_stochastic_rounding():
    from mscs_tpu.data.sampler import repeat_factor_indices
    rfs = np.array([1.0, 2.0, 1.5])
    counts = np.zeros(3)
    for epoch in range(200):
        idx = repeat_factor_indices(rfs, epoch, seed=1)
        for i in range(3):
            counts[i] += (idx == i).sum()
    counts /= 200
    np.testing.assert_allclose(counts, rfs, atol=0.1)
