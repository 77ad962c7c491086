"""Swin internals parity: window attention vs a torch oracle built from the
published formulation, and the shifted-window mask vs brute force."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mscs_tpu.models.swin import (
    WindowAttention,
    _relative_position_index,
    _shift_attn_mask,
)


def torch_window_attention(x, qkv_w, qkv_b, proj_w, proj_b, table, idx,
                           heads):
    """Oracle: scaled-dot window attention with relative position bias."""
    bnw, n, c = x.shape
    hd = c // heads
    qkv = torch.nn.functional.linear(x, qkv_w, qkv_b)
    qkv = qkv.reshape(bnw, n, 3, heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
    bias = table[idx.reshape(-1)].reshape(n, n, heads).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)
    attn = attn.softmax(-1)
    out = (attn @ v).transpose(1, 2).reshape(bnw, n, c)
    return torch.nn.functional.linear(out, proj_w, proj_b)


@pytest.mark.parametrize("heads", [1, 4])
def test_window_attention_matches_torch(heads, rng_np):
    ws, c, bnw = 7, 32, 3
    n = ws * ws
    x = rng_np.standard_normal((bnw, n, c)).astype(np.float32)

    m = WindowAttention(c, ws, heads, qkv_bias=True)
    variables = m.init(jax.random.key(0), jnp.asarray(x), None)
    p = variables["params"]

    idx = torch.from_numpy(_relative_position_index(ws)).long()
    want = torch_window_attention(
        torch.from_numpy(x),
        torch.from_numpy(np.asarray(p["qkv"]["kernel"]).T.copy()),
        torch.from_numpy(np.asarray(p["qkv"]["bias"]).copy()),
        torch.from_numpy(np.asarray(p["proj"]["kernel"]).T.copy()),
        torch.from_numpy(np.asarray(p["proj"]["bias"]).copy()),
        torch.from_numpy(np.asarray(p["relative_position_bias_table"]).copy()),
        idx, heads).detach().numpy()

    got = np.asarray(m.apply(variables, jnp.asarray(x), None))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_relative_position_index_properties():
    ws = 7
    idx = _relative_position_index(ws)
    n = ws * ws
    assert idx.shape == (n, n)
    # symmetric pairs map to mirrored table entries; diagonal is the center
    center = (ws - 1) * (2 * ws - 1) + (ws - 1)
    assert (np.diag(idx) == center).all()
    assert idx.min() >= 0 and idx.max() < (2 * ws - 1) ** 2


def test_shift_mask_matches_bruteforce():
    hp = wp = 14
    ws, shift = 7, 3
    mask = _shift_attn_mask(hp, wp, ws, shift)

    # brute force: roll coordinates, group into windows, compare region ids
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    want = np.where(win[:, None, :] != win[:, :, None], -100.0, 0.0)
    np.testing.assert_array_equal(mask, want)

    # every window attends to itself
    assert (np.diagonal(mask, axis1=1, axis2=2) == 0).all()
