"""Pallas branch0 conv-chain prototypes == XLA reference (interpret mode).

ops/pallas_branch0.py is the VERDICT-r2 #3 prototype: an im2col-matmul
schedule for HRNet's thin-branch 3x3 convs.  These tests pin its numerics
against lax.conv_general_dilated on CPU (interpret=True) so the TPU
measurement tool (tools/branch0_bench.py) only ever times a correct kernel.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mscs_tpu.ops.pallas_branch0 import conv3x3_48, fused_block_pair


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def test_conv3x3_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 8)) * 0.1, jnp.float32)
    ref = _conv(x, w)
    got = conv3x3_48(x, w, rows_per_chunk=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_pair_matches_xla():
    rng = np.random.default_rng(1)
    c = 8
    x = jnp.asarray(rng.normal(size=(1, 16, 16, c)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    bias = jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32)

    y = _conv(x, w1)
    y = jnp.maximum(y * scale + bias, 0.0)
    ref = _conv(y, w2)
    got = fused_block_pair(x, w1, scale, bias, w2, rows_per_chunk=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
