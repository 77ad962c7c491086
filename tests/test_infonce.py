"""InfoNCE parity vs an independent torch oracle of the published loss.

Oracle: dense (T·V)² implementation of the paper's InfoNCE variant
(log_prob = z - log(exp(z) + sum_neg exp(z)), positive-mean then anchor-mean)
written from the math spec with dynamic shapes, like the reference runs it.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mscs_tpu.ops import masked_infonce, masked_infonce_cross


def oracle_self(feats: torch.Tensor, labels: torch.Tensor, temp: float):
    """feats (M, C) valid-only rows; labels (M,)."""
    f = torch.nn.functional.normalize(feats, p=2, dim=1)
    z = (f @ f.T) / temp
    same = labels[:, None] == labels[None, :]
    eye = torch.eye(len(labels), dtype=torch.bool)
    pos = same & ~eye
    neg = ~same
    ez = torch.exp(z)
    ns = (ez * neg).sum(1, keepdim=True)
    log_prob = z - torch.log(ez + ns)
    mean_pos = (pos * log_prob).sum(1) / pos.sum(1)
    return -mean_pos.mean()


def oracle_cross(f1, l1, f2, l2, temp: float):
    a = torch.nn.functional.normalize(f1, p=2, dim=1)
    b = torch.nn.functional.normalize(f2, p=2, dim=1)
    z = (a @ b.T) / temp
    pos = (l1[:, None] == l2[None, :]).float()
    neg = 1.0 - pos
    ez = torch.exp(z)
    ns = (ez * neg).sum(1, keepdim=True)
    log_prob = z - torch.log(ez + ns)
    p = pos.sum(1)
    norm = torch.where(p > 0, p, torch.ones_like(p))
    return -((pos * log_prob).sum(1) / norm).mean()


def _slotify(feats, labels, m_cap, rng):
    """Scatter valid anchors into the first rows of a fixed slot array."""
    m = feats.shape[0]
    out_f = np.zeros((m_cap, feats.shape[1]), np.float32)
    out_l = np.zeros((m_cap,), np.int32)
    out_v = np.zeros((m_cap,), bool)
    out_f[:m] = feats
    out_l[:m] = labels
    out_v[:m] = True
    return out_f, out_l, out_v


@pytest.mark.parametrize("m,c,k", [(60, 16, 5), (256, 32, 9)])
@pytest.mark.parametrize("chunk", [128, 1024])
def test_self_contrast_matches_oracle(m, c, k, chunk, rng_np):
    # labels with >=2 occurrences each so every anchor has a positive
    labels = rng_np.integers(0, k, size=m)
    labels = np.sort(labels)  # sorted ensures class blocks; still random counts
    labels = np.where(np.bincount(labels, minlength=k)[labels] < 2, 0, labels)
    feats = rng_np.standard_normal((m, c)).astype(np.float32)
    temp = 0.1

    want = oracle_self(torch.from_numpy(feats), torch.from_numpy(labels), temp)

    m_cap = 512
    f, l, v = _slotify(feats, labels, m_cap, rng_np)
    got = masked_infonce(jnp.asarray(f), jnp.asarray(l), jnp.asarray(v),
                         temperature=temp, row_chunk=chunk)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)


def test_cross_contrast_matches_oracle(rng_np):
    m1, m2, c = 48, 80, 24
    l1 = rng_np.integers(0, 6, size=m1)
    l2 = rng_np.integers(0, 6, size=m2)
    f1 = rng_np.standard_normal((m1, c)).astype(np.float32)
    f2 = rng_np.standard_normal((m2, c)).astype(np.float32)
    temp = 0.1
    want = oracle_cross(torch.from_numpy(f1), torch.from_numpy(l1),
                        torch.from_numpy(f2), torch.from_numpy(l2), temp)
    fa, la, va = _slotify(f1, l1, 128, rng_np)
    fb, lb, vb = _slotify(f2, l2, 128, rng_np)
    got = masked_infonce_cross(jnp.asarray(fa), jnp.asarray(la), jnp.asarray(va),
                               jnp.asarray(fb), jnp.asarray(lb), jnp.asarray(vb),
                               temperature=temp)
    # exp() at |z|<=10 amplifies 1-ulp fp32 differences between backends
    np.testing.assert_allclose(float(got), float(want), rtol=3e-4)


def test_gradients_match_torch_oracle(rng_np):
    m, c = 64, 16
    labels = np.repeat(np.arange(8), 8)
    feats = rng_np.standard_normal((m, c)).astype(np.float32)
    temp = 0.1

    t_feats = torch.from_numpy(feats).requires_grad_(True)
    loss = oracle_self(t_feats, torch.from_numpy(labels), temp)
    loss.backward()
    want_grad = t_feats.grad.numpy()

    f, l, v = _slotify(feats, labels, 128, rng_np)

    def loss_fn(x):
        return masked_infonce(x, jnp.asarray(l), jnp.asarray(v), temperature=temp)

    got_grad = np.asarray(jax.grad(loss_fn)(jnp.asarray(f)))[:m]
    np.testing.assert_allclose(got_grad, want_grad, rtol=2e-3, atol=5e-4)


def test_all_invalid_gives_zero_loss_and_grad():
    f = jnp.zeros((128, 8), jnp.float32)
    l = jnp.zeros((128,), jnp.int32)
    v = jnp.zeros((128,), bool)
    loss, grad = jax.value_and_grad(
        lambda x: masked_infonce(x, l, v, temperature=0.1))(f)
    assert float(loss) == 0.0
    assert np.all(np.isfinite(np.asarray(grad)))
