"""Loss-zoo parity vs torch oracles."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mscs_tpu.losses import (
    CITYSCAPES_CE_WEIGHTS,
    DenseContrastiveLossV2,
    DenseContrastiveLossV2_ms,
    LossWrapper,
    cross_entropy,
    lovasz_softmax,
)


# ---------------------------------------------------------------- CE --------

@pytest.mark.parametrize("weighted", [False, True])
def test_cross_entropy_matches_torch(weighted, rng_np):
    n, h, w, c = 2, 16, 24, 19
    logits = rng_np.standard_normal((n, h, w, c)).astype(np.float32)
    target = rng_np.integers(0, c + 1, size=(n, h, w))  # incl. ignore id == c
    weights = np.asarray(CITYSCAPES_CE_WEIGHTS, np.float32) if weighted else None

    t_logits = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    want = F.cross_entropy(t_logits, torch.from_numpy(target).long(),
                           weight=None if weights is None else torch.from_numpy(weights),
                           ignore_index=c).item()
    got = cross_entropy(jnp.asarray(logits), jnp.asarray(target),
                        ignore_index=c,
                        class_weights=None if weights is None else jnp.asarray(weights))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_cross_entropy_grad_matches_torch(rng_np):
    n, h, w, c = 1, 8, 8, 5
    logits = rng_np.standard_normal((n, h, w, c)).astype(np.float32)
    target = rng_np.integers(0, c + 1, size=(n, h, w))
    t = torch.from_numpy(logits.transpose(0, 3, 1, 2)).requires_grad_(True)
    F.cross_entropy(t, torch.from_numpy(target).long(), ignore_index=c).backward()
    want = t.grad.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(jax.grad(lambda x: cross_entropy(
        x, jnp.asarray(target), ignore_index=c))(jnp.asarray(logits)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)


# ------------------------------------------------------------ Lovász --------

def _torch_lovasz_oracle(logits, labels, ignore, classes="present"):
    """Independent torch implementation of multi-class Lovász-Softmax
    (Berman et al. 2018, Alg. 1) with dynamic pixel filtering."""
    prob = torch.softmax(logits, dim=1)
    n, c, h, w = prob.shape
    p = prob.permute(0, 2, 3, 1).reshape(-1, c)
    l = labels.reshape(-1)
    keep = l != ignore
    p, l = p[keep], l[keep]
    losses = []
    class_ids = range(c) if isinstance(classes, str) else classes
    for cls in class_ids:
        fg = (l == cls).float()
        if classes == "present" and fg.sum() == 0:
            continue
        errors = (fg - p[:, cls]).abs()
        err_sorted, perm = torch.sort(errors, 0, descending=True)
        fg_sorted = fg[perm]
        gts = fg_sorted.sum()
        inter = gts - fg_sorted.cumsum(0)
        union = gts + (1 - fg_sorted).cumsum(0)
        jac = 1.0 - inter / union
        if len(jac) > 1:
            jac[1:] = jac[1:] - jac[:-1]
        losses.append(torch.dot(err_sorted, jac))
    return torch.stack(losses).mean() if losses else torch.tensor(0.0)


@pytest.mark.parametrize("classes", ["present", "all"])
def test_lovasz_matches_oracle(classes, rng_np):
    n, h, w, c = 2, 12, 16, 7
    logits = rng_np.standard_normal((n, h, w, c)).astype(np.float32) * 2
    target = rng_np.integers(0, c + 1, size=(n, h, w))
    target[0, :2] = c  # ensure some ignored pixels
    want = _torch_lovasz_oracle(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(target).long(), ignore=c, classes=classes).item()
    got = lovasz_softmax(jnp.asarray(logits), jnp.asarray(target),
                         ignore_index=c, classes_to_consider=classes)
    np.testing.assert_allclose(float(got), want, rtol=1e-4, atol=1e-6)


def test_lovasz_class_list_mode(rng_np):
    """classes_to_consider as an explicit class-id list
    (ref LovaszSoftmax.py:22,51)."""
    n, h, w, c = 1, 12, 12, 6
    logits = rng_np.standard_normal((n, h, w, c)).astype(np.float32)
    target = rng_np.integers(0, c, size=(n, h, w))
    sel = [0, 2, 5]
    want = _torch_lovasz_oracle(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(target).long(), ignore=c, classes=sel).item()
    got = lovasz_softmax(jnp.asarray(logits), jnp.asarray(target),
                         ignore_index=c, classes_to_consider=sel)
    np.testing.assert_allclose(float(got), want, rtol=1e-4, atol=1e-6)


def test_lovasz_absent_class_present_mode(rng_np):
    """A class absent from the labels must not affect 'present'-mode mean."""
    n, h, w, c = 1, 10, 10, 4
    logits = rng_np.standard_normal((n, h, w, c)).astype(np.float32)
    target = rng_np.integers(0, 2, size=(n, h, w))  # classes 2,3 absent
    want = _torch_lovasz_oracle(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(target).long(), ignore=c).item()
    got = lovasz_softmax(jnp.asarray(logits), jnp.asarray(target),
                         ignore_index=c)
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


# -------------------------------------------- dense contrastive stack -------

def _fake_batch(rng_np, n=2, hw=64, d=16, num_classes=20):
    label = rng_np.integers(0, num_classes, size=(n, hw, hw)).astype(np.int32)
    feats = [rng_np.standard_normal((n, hw // s, hw // s, d)).astype(np.float32)
             for s in (4, 8, 16, 32)]
    return jnp.asarray(label), [jnp.asarray(f) for f in feats]


def test_dcv2_runs_and_is_finite(rng_np):
    loss_fn = DenseContrastiveLossV2.from_config({
        "dataset": "CITYSCAPES", "experiment": 1, "temperature": 0.1,
        "max_features_total": 512})
    label, feats = _fake_batch(rng_np)
    loss = loss_fn(jax.random.key(0), label, feats[0])
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_dcv2_ms_cross_scale(rng_np):
    loss_fn = DenseContrastiveLossV2_ms.from_config({
        "dataset": "CITYSCAPES", "experiment": 1, "temperature": 0.1,
        "scales": 4, "weights": [1, 0.7, 0.4, 0.1],
        "cross_scale_contrast": True, "max_features_total": 512})
    label, feats = _fake_batch(rng_np)
    loss, aux = loss_fn(jax.random.key(0), label, feats)
    assert np.isfinite(float(loss))
    assert len(aux["ms_losses"]) == 4
    assert len(aux["cs_losses"]) == 2  # high-low and high-mid
    # weighted scale losses alone must be <= total (cs adds positive terms)
    ms_sum = sum(w * float(v) for w, v in zip([1, 0.7, 0.4, 0.1], aux["ms_losses"]))
    assert float(loss) >= ms_sum - 1e-4


def test_dcv2_ms_gradients_flow_and_detach(rng_np):
    label, feats = _fake_batch(rng_np, hw=32)
    cfg = {"dataset": "CITYSCAPES", "experiment": 1, "temperature": 0.1,
           "scales": 2, "weights": [1.0, 0.5], "cross_scale_contrast": True,
           "max_features_total": 256}
    for detach in (False, True):
        loss_fn = DenseContrastiveLossV2_ms.from_config({**cfg, "detach_deepest": detach})
        g = jax.grad(lambda fs: loss_fn(jax.random.key(0), label, fs)[0])(feats[:2])
        assert all(np.isfinite(np.asarray(gi)).all() for gi in g)
        assert np.abs(np.asarray(g[0])).max() > 0


def test_loss_wrapper_ce_plus_ms(rng_np):
    config = {
        "dataset": "CITYSCAPES", "experiment": 1, "device": None,
        "temperature": 0.1, "scales": 4, "weights": [1, 0.7, 0.4, 0.1],
        "cross_scale_contrast": True, "max_features_total": 512,
        "losses": {"CrossEntropyLoss": 1, "DenseContrastiveLossV2_ms": 0.1},
    }
    wrapper = LossWrapper.from_config(config)
    label, feats = _fake_batch(rng_np)
    logits = jnp.asarray(
        rng_np.standard_normal((2, 64, 64, 19)).astype(np.float32))
    total, vals = wrapper(jax.random.key(0), logits, label, deep_features=feats)
    assert np.isfinite(float(total))
    assert set(vals) >= {"CrossEntropyLoss", "DenseContrastiveLossV2_ms",
                         "DenseContrastiveLossV2_ms_ms0",
                         "DenseContrastiveLossV2_ms_cs0"}
    recomputed = float(vals["CrossEntropyLoss"]) + float(vals["DenseContrastiveLossV2_ms"])
    np.testing.assert_allclose(float(total), recomputed, rtol=1e-5)
