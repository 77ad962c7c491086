"""Measure the HRNet branch0 conv-chain prototypes (VERDICT r2 #3).

The question: can a hand-scheduled Pallas kernel beat XLA's conv lowering
on the flagship's thin-branch shape — bf16 (8, 128, 128, 48) 3x3 convs —
where XLA measures 37.7 TF/s fwd in-graph (~20% of v5e peak)?

Measures, isolated on the real chip:

  xla_conv     one 3x3 conv (lax.conv_general_dilated, NHWC)
  xla_pair     conv -> affine -> relu -> conv (BN folded, inference form)
  xla_block    full BasicBlock fwd, train-mode BN (the in-graph reality)
  pl_conv      ops/pallas_branch0.conv3x3_48
  pl_pair      ops/pallas_branch0.fused_block_pair

plus fwd+bwd for the XLA pair (the Pallas prototype is forward-only —
a bwd would only be built on a keep verdict).

Usage: python tools/branch0_bench.py [--bs 8] [--hw 128] [--ch 48]
Prints one JSON line per variant: {name, ms, tflops_s}.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(step, x0, iters=50, warmup=2):
    """ms per iteration of x -> step(x), chained inside ONE dispatch.

    Through the axon tunnel a single dispatch costs ~1 ms wall, which
    swamps these ~0.15 ms kernels — so each variant is measured as a
    jitted fori_loop of ``iters`` data-dependent applications and the
    wall time of that one dispatch is divided by ``iters``.
    """
    import jax

    @jax.jit
    def chain(x):
        return jax.lax.fori_loop(0, iters, lambda i, v: step(v), x)

    for _ in range(warmup):
        out = chain(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chain(x0)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--ch", type=int, default=48)
    ap.add_argument("--rows", type=int, default=16,
                    help="rows per in-kernel chunk")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mscs_tpu.ops.pallas_branch0 import conv3x3_48, fused_block_pair

    b, hw, c = args.bs, args.hw, args.ch
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (b, hw, hw, c), jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (3, 3, c, c), jnp.float32) * 0.05
    w2 = jax.random.normal(ks[2], (3, 3, c, c), jnp.float32) * 0.05
    scale = jax.random.uniform(ks[3], (c,), jnp.float32, 0.5, 1.5)
    bias = jax.random.normal(ks[4], (c,), jnp.float32) * 0.1

    conv_flops = 2 * b * hw * hw * 9 * c * c

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    @jax.jit
    def xla_conv(x, w):
        return conv(x, w)

    @jax.jit
    def xla_pair(x, w1, scale, bias, w2):
        y = conv(x, w1)
        y = jnp.maximum(y * scale.astype(y.dtype) + bias.astype(y.dtype), 0)
        return conv(y, w2)

    @jax.jit
    def xla_block(x, w1, w2):
        """Train-mode BasicBlock fwd: conv+BN-stats+relu, conv+BN, +res."""
        def bn(y):
            yf = y.astype(jnp.float32)
            mu = yf.mean((0, 1, 2))
            var = yf.var((0, 1, 2))
            return ((yf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(y.dtype)
        y = jnp.maximum(bn(conv(x, w1)), 0)
        return jnp.maximum(bn(conv(y, w2)) + x, 0)

    def conv_b(x, w):
        # pure-bf16 conv for the grad timing: preferred_element_type=fp32
        # makes the cotangent fp32 and the transpose conv rejects the
        # mixed (bf16, fp32) operand pair
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def xla_pair_grad(x, w1, scale, bias, w2):
        def f(x, w1, w2):
            y = conv_b(x, w1)
            y = jnp.maximum(y * scale.astype(y.dtype)
                            + bias.astype(y.dtype), 0)
            return conv_b(y, w2).astype(jnp.float32).sum()
        return jax.grad(f, argnums=(0, 1, 2))(x, w1, w2)

    pl_conv = jax.jit(functools.partial(conv3x3_48,
                                        rows_per_chunk=args.rows))
    pl_pair = jax.jit(functools.partial(fused_block_pair,
                                        rows_per_chunk=args.rows))

    # numerics check vs XLA before timing
    ref = xla_conv(x, w1)
    got = pl_conv(x, w1)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    refp = xla_pair(x, w1, scale, bias, w2)
    gotp = pl_pair(x, w1, scale, bias, w2)
    errp = float(jnp.max(jnp.abs(refp.astype(jnp.float32)
                                 - gotp.astype(jnp.float32))))
    print(f"# max|pl-xla| conv={err:.4f} pair={errp:.4f} "
          f"(bf16 ulps expected)", file=sys.stderr)

    runs = [
        ("xla_conv", lambda v: xla_conv(v, w1), conv_flops),
        ("xla_pair", lambda v: xla_pair(v, w1, scale, bias, w2),
         2 * conv_flops),
        ("xla_block", lambda v: xla_block(v, w1, w2), 2 * conv_flops),
        ("xla_pair_fwdbwd",
         lambda v: xla_pair_grad(v, w1, scale, bias, w2)[0],
         6 * conv_flops),
        ("pl_conv", lambda v: pl_conv(v, w1), conv_flops),
        ("pl_pair", lambda v: pl_pair(v, w1, scale, bias, w2),
         2 * conv_flops),
    ]
    for name, fn, flops in runs:
        # re-normalise each step so chained bf16 values stay finite
        def step(v, fn=fn):
            y = fn(v)
            return (y * jax.lax.rsqrt(
                jnp.mean(jnp.square(y.astype(jnp.float32))) + 1e-6
            ).astype(y.dtype))
        ms = timeit(step, x, iters=args.iters)
        print(json.dumps({"name": name, "ms": round(ms, 4),
                          "tflops_s": round(flops / (ms * 1e-3) / 1e12, 1)}))


if __name__ == "__main__":
    main()
