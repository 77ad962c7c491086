"""Pallas prototype: fused HRNet thin-branch conv chain (VERDICT r2 #3).

HRNet-W48's branch0 (48 ch @ 128², 8 modules x 4 BasicBlocks) is the
flagship step's biggest structural cost: XLA runs its 3x3 convs at
~37.7 TF/s fwd — ~20% of v5e bf16 peak — because the 48 output channels
fill only 48 of the MXU's 128 lanes (PERF.md r2 profile §3).  HBM traffic
is NOT the issue at this size (6.3 MB/tensor), so chain fusion per se buys
almost nothing; the only question is whether a hand-scheduled Pallas
matmul formulation can beat XLA's conv lowering on the exact shape.

Schedule ("K432"): grid over (batch, row-chunks); per chunk, build the
im2col patch matrix (R·W, 9·48=432) in VMEM from 9 statically shifted
slices of the (pre-padded) input, then one MXU dot
(R·W, 432) @ (432, 48).  K=432 fills the contraction depth (84% after
pad-to-512); the 48-lane output underfill is architecture-inherent
(pair-packing two output pixels into lanes was analysed and rejected:
it needs stride-2 sublane gathers whose VPU cost exceeds the MXU win).
The row-chunk loop lives in the Pallas GRID, not a Python loop: an
unrolled 8-chunk body previously produced so much vector IR that Mosaic
compilation did not finish in 9 minutes.

Two entry points:

- ``conv3x3_48``: single 3x3 conv, apples-to-apples vs one XLA conv.
- ``fused_block_pair``: conv3x3 -> affine(scale,bias) -> relu -> conv3x3
  entirely in VMEM — the BasicBlock's two convs with BN folded to an
  affine (inference-mode semantics).  Training-mode BN needs batch stats
  *between* the convs, a cross-image dependency this prototype does not
  plumb; the MXU-schedule question it exists to answer is unaffected.

Measured by ``tools/branch0_bench.py``; keep-or-kill verdict in PERF.md.
Ref perf anchor: PERF.md r2 profile §3 (branch0 23.7 ms/step at 37.7 fwd
/ 47.4 bwd TF/s).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _conv_rows(x, w2d, out_rows: int, out_w: int, out_dtype, shift_ref,
               mxu_dtype):
    """3x3 valid conv over a padded chunk via one im2col matmul.

    x: (out_rows + 2, out_w + 2, C) VMEM value.
    w2d: (9 * C, C_out) — rows ordered (dy, dx, ci).
    shift_ref: (3, out_rows + 2, out_w, C) fp32 VMEM scratch.
    Returns (out_rows, out_w, C_out) in ``out_dtype``.

    Mosaic rejects lane-dim concats whose inputs disagree on the
    (non-concat) sublane offset, and layout inference folds in-kernel
    rolls back into offset layouts — so the three dx shifts are
    materialised by STORING each shifted slice into ``shift_ref`` (the
    store performs the relayout; fp32 because Mosaic's rotate only
    handles 32-bit data).  The dy shifts index the untiled leading dim
    and are free.
    """
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    for dx in range(3):
        shift_ref[dx] = xf[:, dx:dx + out_w, :]
    parts = [
        shift_ref[dx, dy:dy + out_rows]
        for dy in range(3) for dx in range(3)
    ]
    patch = (jnp.concatenate(parts, axis=-1)
             .reshape(out_rows * out_w, 9 * c).astype(mxu_dtype))
    out = jax.lax.dot_general(
        patch, w2d, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out.reshape(out_rows, out_w, -1).astype(out_dtype)


def _conv_kernel(x_ref, w_ref, o_ref, shift_ref, *, rows_per_chunk: int):
    # x_ref: the whole padded image (1, H+2, W+2, C) — constant index map,
    # so Pallas fetches it once per image, not once per chunk.
    rc = pl.program_id(1)
    w = o_ref.shape[2]
    chunk = x_ref[0, pl.ds(rc * rows_per_chunk, rows_per_chunk + 2)]
    o_ref[0] = _conv_rows(chunk, w_ref[...], rows_per_chunk, w,
                          o_ref.dtype, shift_ref, x_ref.dtype)


def _pair_kernel(x_ref, w1_ref, a1_ref, b1_ref, w2_ref, o_ref,
                 shift1_ref, shift2_ref, *, rows_per_chunk: int,
                 out_h: int):
    rc = pl.program_id(1)
    w = o_ref.shape[2]
    # conv1 consumes R+4 input rows -> R+2 rows at width w+2 (halo
    # for conv2), all resident in VMEM; conv2 -> R rows at width w.
    chunk = x_ref[0, pl.ds(rc * rows_per_chunk, rows_per_chunk + 4)]
    y1 = _conv_rows(chunk, w1_ref[...], rows_per_chunk + 2, w + 2,
                    jnp.float32, shift1_ref, x_ref.dtype)
    y1 = jnp.maximum(y1 * a1_ref[...] + b1_ref[...], 0.0)
    # conv2 zero-pads conv1's OUTPUT in the unfused reference: y1's
    # halo ring lies outside the image and must be zeroed, not the
    # (nonzero) conv-affine-relu of the padded input.
    col = jax.lax.broadcasted_iota(jnp.int32, y1.shape, 1)
    row = (jax.lax.broadcasted_iota(jnp.int32, y1.shape, 0)
           + rc * rows_per_chunk - 1)
    valid = ((col >= 1) & (col <= w) & (row >= 0) & (row <= out_h - 1))
    y1 = jnp.where(valid, y1, 0.0)
    o_ref[0] = _conv_rows(y1, w2_ref[...], rows_per_chunk, w,
                          o_ref.dtype, shift2_ref, x_ref.dtype)


def _w2d(w):
    """(3, 3, C_in, C_out) -> (9*C_in, C_out) rows ordered (dy, dx, ci)."""
    return w.reshape(-1, w.shape[-1])


def conv3x3_48(x, w, *, rows_per_chunk: int = 16):
    """3x3 SAME conv, stride 1, NHWC, via the K432 Pallas schedule.

    x: (B, H, W, C); w: (3, 3, C, C_out).  fp32 accumulate, output in
    x.dtype.  Prototype: forward only.
    """
    b, h, wd, c = x.shape
    assert h % rows_per_chunk == 0
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w2d = _w2d(w).astype(x.dtype)
    flops = 2 * b * h * wd * 9 * c * w.shape[-1]
    return pl.pallas_call(
        functools.partial(_conv_kernel, rows_per_chunk=rows_per_chunk),
        grid=(b, h // rows_per_chunk),
        in_specs=[
            pl.BlockSpec((1, h + 2, wd + 2, c), lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2d.shape, lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_per_chunk, wd, w.shape[-1]),
                               lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, w.shape[-1]), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, rows_per_chunk + 2, wd, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(xp, w2d)


def fused_block_pair(x, w1, scale1, bias1, w2, *, rows_per_chunk: int = 16):
    """conv3x3 -> per-channel affine -> relu -> conv3x3, fused in VMEM.

    The BasicBlock's conv pair (models/hrnet.py BasicBlock) with BN1
    folded into (scale1, bias1).  x: (B, H, W, C); w1/w2: (3, 3, C, C).
    Forward only; intermediate never touches HBM.
    """
    b, h, wd, c = x.shape
    assert h % rows_per_chunk == 0
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    w1d, w2d = _w2d(w1).astype(x.dtype), _w2d(w2).astype(x.dtype)
    a1 = scale1.astype(jnp.float32).reshape(1, 1, c)
    b1 = bias1.astype(jnp.float32).reshape(1, 1, c)
    flops = 2 * 2 * b * h * wd * 9 * c * c
    return pl.pallas_call(
        functools.partial(_pair_kernel, rows_per_chunk=rows_per_chunk,
                          out_h=h),
        grid=(b, h // rows_per_chunk),
        in_specs=[
            pl.BlockSpec((1, h + 4, wd + 4, c), lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1d.shape, lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(a1.shape, lambda i, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, lambda i, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2d.shape, lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_per_chunk, wd, c),
                               lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, rows_per_chunk + 4, wd + 2, c), jnp.float32),
            pltpu.VMEM((3, rows_per_chunk + 2, wd, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(xp, w1d, a1, b1, w2d)
