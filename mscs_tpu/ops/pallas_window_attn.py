"""Fused Pallas TPU kernel for Swin windowed attention (fwd + bwd).

Why: XLA lowers the per-window attention einsums (ref ``models/Swin.py:
150-230`` semantics; our ``models/swin.py`` WindowAttention) as batched
(49, 32)x(32, 49) dots — hopeless MXU shapes that measure 2-3 TF/s — and
surrounds them with head-split transposes whose minor dim is d=32 (the
slow, lane-breaking kind).  PERF.md r3: ~18.6 ms/step of attention dots
plus a large share of 26 ms "data formatting" at upnswin bs8 512².

Split of labour (v2 — measured against a v1 that also did the window
partition inside the kernel and lost 2x to per-window (7,7,C)->(49,C)
sublane relayouts):

- XLA outside: the qkv dense (one big efficient matmul) and the window
  partition reshape+transpose.  The partition keeps C in lanes — the
  cheap transpose kind — and hands the kernel (B, nWr, nWc, N, C) arrays
  where selecting a window is a free leading-dim index.
- Pallas kernel: per window, per head — scores, relative-position bias,
  shift mask, fp32 softmax, PV product — entirely in VMEM.  No (N, N)
  probability tensors and no (BW, h, N, d) head transposes ever reach HBM.
  The backward recomputes scores per window (flash-attention style, zero
  residuals) and fuses dq/dk/dv with the cross-step dbias accumulation.

Semantics match the XLA path exactly: fp32 scores, ``q*scale @ k^T + bias
+ mask``, fp32 softmax, P cast to the compute dtype for the PV matmul.
Attention dropout is NOT supported — callers gate on ``attn_drop == 0``
(the shipped configs never enable it).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _attend(qw, kw, vw, bias_ref, m, *, heads, scale, out_dtype):
    """One window: (n, c) q/k/v -> (n, c) output, per-head loop."""
    n, c = qw.shape
    d = c // heads
    outs = []
    for h in range(heads):
        hs = slice(h * d, (h + 1) * d)
        s = jax.lax.dot_general(
            qw[:, hs], kw[:, hs], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s * scale + bias_ref[h] + m
        p = jax.nn.softmax(s, axis=-1).astype(vw.dtype)
        oh = jax.lax.dot_general(
            p, vw[:, hs], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append(oh.astype(out_dtype))
    return jnp.concatenate(outs, axis=-1)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref,
                *, heads, nwc, mask_cols, scale):
    for j in range(nwc):
        m = mask_ref[0, j if mask_cols > 1 else 0]
        o_ref[0, 0, j] = _attend(q_ref[0, 0, j], k_ref[0, 0, j],
                                 v_ref[0, 0, j], bias_ref, m, heads=heads,
                                 scale=scale, out_dtype=o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref,
                *, heads, nwc, mask_cols, scale):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    c = q_ref.shape[-1]
    d = c // heads
    for j in range(nwc):
        qw, kw, vw = q_ref[0, 0, j], k_ref[0, 0, j], v_ref[0, 0, j]
        dow = do_ref[0, 0, j]
        m = mask_ref[0, j if mask_cols > 1 else 0]
        dqs, dks, dvs = [], [], []
        for h in range(heads):
            hs = slice(h * d, (h + 1) * d)
            qh, kh, vh = qw[:, hs], kw[:, hs], vw[:, hs]
            doh = dow[:, hs]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * scale + bias_ref[h] + m
            p = jax.nn.softmax(s, axis=-1)            # fp32 (n, n)
            dp = jax.lax.dot_general(                 # dO @ V^T: (n, n)
                doh, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dbias_ref[h] += ds
            pc = p.astype(vw.dtype)
            dsc = ds.astype(qw.dtype)
            dqh = jax.lax.dot_general(                # dS @ K: (n, d)
                dsc, kh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dkh = jax.lax.dot_general(                # dS^T @ Q: (n, d)
                dsc, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dvh = jax.lax.dot_general(                # P^T @ dO: (n, d)
                pc, doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqs.append(dqh.astype(dq_ref.dtype))
            dks.append(dkh.astype(dk_ref.dtype))
            dvs.append(dvh.astype(dv_ref.dtype))
        dq_ref[0, 0, j] = jnp.concatenate(dqs, -1)
        dk_ref[0, 0, j] = jnp.concatenate(dks, -1)
        dv_ref[0, 0, j] = jnp.concatenate(dvs, -1)


def _specs(heads, n, mask_cols, nwc, c):
    blk = pl.BlockSpec((1, 1, nwc, n, c), lambda b, i: (b, i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((heads, n, n), lambda b, i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    if mask_cols > 1:
        mask_spec = pl.BlockSpec((1, mask_cols, n, n),
                                 lambda b, i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_spec = pl.BlockSpec((1, 1, n, n), lambda b, i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    return blk, bias_spec, mask_spec


def _flops(b, nwr, nwc, n, c, *, bwd: bool) -> int:
    per = 2 * 2 * n * n * c                      # qk + pv MACs*2
    return per * b * nwr * nwc * (3 if bwd else 1)


_VMEM_CAP = 100 << 20  # v5e has 128 MB/core; leave headroom

# Max windows per kernel grid step.  Training grids (512² -> 19) fit the
# default scoped budget; wider rows are re-chunked in the NHWC wrapper.
_NWC_MAX = 32


def _compiler_params(nwc, n, c, itemsize, heads, mask_cols, *, bwd: bool):
    """Footprint-derived scoped-vmem limit.

    The default 16 MB limit fails at WIDE window rows: eval/TTA shapes like
    1024x2048-derived grids make the per-step (1,1,nwc,n,c) blocks big
    enough that double-buffered q/k/v/out (+grads) exceed it by a hair
    ("Scoped allocation with size 16.19M and limit 16.00M", r5
    logs/tta_swinl.log).  Training grids (nwc<=19) fit the default."""
    block = nwc * n * c * itemsize
    bias = heads * n * n * 4
    mask = max(mask_cols, 1) * n * n * 4
    n_blocks = 7 if bwd else 4                   # q,k,v,(do,dq,dk,dv)|out
    # 4x the double-buffered block math: Mosaic's true scoped need runs
    # well past it (measured 16.19M against a 15.7M block-math estimate at
    # nwc=37, r5) — a generous LIMIT is free, an under-limit is a compile
    # error.
    need = 4 * n_blocks * block + 2 * (bias + mask + (bias if bwd else 0))
    need += 8 << 20                              # scratch/regalloc slack
    return pltpu.CompilerParams(
        vmem_limit_bytes=max(16 << 20, min(need, _VMEM_CAP)))


def _fwd_call(q, k, v, bias, mask, *, heads, scale):
    b, nwr, nwc, n, c = q.shape
    mask_cols = mask.shape[1]
    blk, bias_spec, mask_spec = _specs(heads, n, mask_cols, nwc, c)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, nwc=nwc,
                          mask_cols=mask_cols, scale=scale),
        grid=(b, nwr),
        in_specs=[blk, blk, blk, bias_spec, mask_spec],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=_flops(b, nwr, nwc, n, c, bwd=False),
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=b * nwr * nwc * heads * n * n),
        compiler_params=_compiler_params(nwc, n, c, q.dtype.itemsize,
                                         heads, mask_cols, bwd=False),
        interpret=_interpret(),
    )(q, k, v, bias, mask)


def _bwd_call(q, k, v, bias, mask, do, *, heads, scale):
    b, nwr, nwc, n, c = q.shape
    mask_cols = mask.shape[1]
    blk, bias_spec, mask_spec = _specs(heads, n, mask_cols, nwc, c)
    dbias_spec = pl.BlockSpec((heads, n, n), lambda b, i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, nwc=nwc,
                          mask_cols=mask_cols, scale=scale),
        grid=(b, nwr),
        in_specs=[blk, blk, blk, bias_spec, mask_spec, blk],
        out_specs=[blk, blk, blk, dbias_spec],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3
        + [jax.ShapeDtypeStruct(bias.shape, jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=_flops(b, nwr, nwc, n, c, bwd=True),
            bytes_accessed=8 * q.size * q.dtype.itemsize,
            transcendentals=b * nwr * nwc * heads * n * n),
        compiler_params=_compiler_params(nwc, n, c, q.dtype.itemsize,
                                         heads, mask_cols, bwd=True),
        interpret=_interpret(),
    )(q, k, v, bias, mask, do)
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _window_attn(q, k, v, bias, mask, heads, scale):
    return _fwd_call(q, k, v, bias, mask, heads=heads, scale=scale)


def _window_attn_fwd(q, k, v, bias, mask, heads, scale):
    o = _fwd_call(q, k, v, bias, mask, heads=heads, scale=scale)
    return o, (q, k, v, bias, mask)


def _window_attn_bwd(heads, scale, res, g):
    q, k, v, bias, mask = res
    dq, dk, dv, dbias = _bwd_call(q, k, v, bias, mask, g.astype(q.dtype),
                                  heads=heads, scale=scale)
    return dq, dk, dv, dbias.astype(bias.dtype), jnp.zeros_like(mask)


_window_attn.defvjp(_window_attn_fwd, _window_attn_bwd)


def window_attention_nhwc(q, k, v, bias, mask, *, num_heads: int,
                          window_size: int = 7):
    """Fused windowed attention over an NHWC feature map.

    Args:
      q, k, v: (B, Hp, Wp, C) with Hp, Wp multiples of ``window_size``
        (post-pad, post-roll for shifted blocks).
      bias: (num_heads, ws², ws²) fp32 relative-position bias.
      mask: (nWr*nWc, ws², ws²) fp32 additive shift mask, or None.
    Returns: (B, Hp, Wp, C) in q's dtype.
    """
    b, hp, wp, c = q.shape
    ws = window_size
    n = ws * ws
    assert hp % ws == 0 and wp % ws == 0, (hp, wp, ws)
    assert c % num_heads == 0
    nwr, nwc = hp // ws, wp // ws
    scale = float((c // num_heads) ** -0.5)
    if mask is None:
        mask = jnp.zeros((1, 1, n, n), jnp.float32)
    else:
        mask = mask.reshape(nwr, nwc, n, n).astype(jnp.float32)

    def part(x):  # C stays in lanes: the cheap transpose kind
        x = x.reshape(b, nwr, ws, nwc, ws, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, nwr, nwc, n, c)

    qp, kp, vp = part(q), part(k), part(v)
    # Wide window rows (whole-image eval/TTA shapes, e.g. 28x55) blow
    # Mosaic's scoped-vmem budget per grid step (r5: "Scoped allocation
    # with size 87.06M", logs/tta_swinl.log).  Windows are an order-free
    # axis and the shift mask is per-window data, so re-chunk
    # (nwr, nwc) -> (rows, chunk<=_NWC_MAX) with zero-padded tail windows
    # (finite softmax over bias; output sliced away).  Gated to nwc >
    # _NWC_MAX only: normalizing ALL grids toward 32-window rows measured
    # ~4% SLOWER on the training shapes (swinT 43.3->41.6, swinL
    # 19.4->18.7 img/s, r5) — the tail pad materializes q/k/v copies at
    # the hot stages, which costs more than the saved grid-step overhead.
    total = nwr * nwc
    if nwc > _NWC_MAX:
        rows = -(-total // _NWC_MAX)
        chunk = -(-total // rows)             # minimal-pad chunking
        pad = rows * chunk - total

        def rechunk(x):
            x = x.reshape(b, total, n, c)
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
            return x.reshape(b, rows, chunk, n, c)

        qp, kp, vp = rechunk(qp), rechunk(kp), rechunk(vp)
        if mask.shape[:2] != (1, 1):
            m = mask.reshape(total, n, n)
            if pad:
                m = jnp.pad(m, ((0, pad), (0, 0), (0, 0)))
            mask = m.reshape(rows, chunk, n, n)
        o = _window_attn(qp, kp, vp, bias.astype(jnp.float32), mask,
                         num_heads, scale)
        o = o.reshape(b, rows * chunk, n, c)[:, :total]
        o = o.reshape(b, nwr, nwc, n, c)
    else:
        o = _window_attn(qp, kp, vp, bias.astype(jnp.float32),
                         mask, num_heads, scale)
    o = o.reshape(b, nwr, nwc, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return o.reshape(b, hp, wp, c)
