"""Plain multi-head self-attention over flattened feature maps.

Equivalent of reference ``models/Transformers.py:5-50`` (used optionally
inside the Projector via the ``trans`` config key).  NHWC in/out.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class SelfAttention(nn.Module):
    dim: int
    heads: int = 1
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        was_map = x.ndim == 4
        if was_map:
            b, h, w, c = x.shape
            x = x.reshape(b, h * w, c)
        b, n, c = x.shape
        head_dim = c // self.heads
        scale = head_dim ** -0.5
        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(c, name="proj")(out)
        if was_map:
            out = out.reshape(b, h, w, c)
        return out
