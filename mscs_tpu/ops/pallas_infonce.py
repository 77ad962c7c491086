"""Fused Pallas TPU kernels for the masked dense InfoNCE.

The reference materialises the (T·V)² similarity matrix in HBM
(``losses/DenseContrastiveLossV2.py:150``, up to 400 MB).  The XLA path in
``ops/infonce.py`` streams row blocks; this module goes further and fuses
matmul + exp + masking + reductions into Pallas kernels so logits never
leave VMEM, with an analytic custom VJP (the backward recomputes z tiles —
flash-attention-style, zero residual logits).

Math (per anchor row i over columns j):
    z_ij  = <fa_i, fb_j> / t                (inputs pre-L2-normalised)
    NS_i  = sum_j neg_ij e^{z_ij}
    L_i   = (1/max(P_i,1)) sum_j pos_ij [z_ij - log(e^{z_ij} + NS_i)]
returned per-row; the caller takes the masked mean.  Gradients:
    dL_i/dz_ij = (1/P_i) (1 - e^z/(e^z+NS_i))        for positive pairs
    dL_i/dz_ik = -(1/P_i) S_i e^{z_ik}               for negative pairs
    with S_i = sum_j pos_ij / (e^{z_ij} + NS_i)      (saved from forward)
    dfa = (dZ fb)/t,  dfb = (dZ^T fa)/t.

Masks are recomputed from labels/validity in every tile (bytes in VMEM
instead of an M×M mask in HBM).  Self-pairs are excluded via global row/col
indices when ``exclude_self`` (the single-scale loss); the cross-scale loss
keeps them.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256  # rows/cols per tile; multiples of the fp32 (8, 128) min tile


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() not in ("tpu", "axon")


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _masks(la, va, ia, lb, vb, ib, exclude_self: bool):
    """Tile masks from int32 label/valid/index column vectors."""
    pair = (va != 0) & (vb.T != 0)
    same = la == lb.T
    pos = pair & same
    if exclude_self:
        pos = pos & (ia != ib.T)
    neg = pair & jnp.logical_not(same)
    return pos.astype(jnp.float32), neg.astype(jnp.float32)


# --------------------------------------------------------------- forward ---

# -------------------------------------------------------------- backward ---

def _dz_tile(fa_t, fb_t, la, va, ia, lb, vb, ib, g, ns, s, p,
             *, inv_temp, exclude_self):
    z = jax.lax.dot_general(fa_t, fb_t, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * inv_temp
    ez = jnp.exp(z)
    pos, neg = _masks(la, va, ia, lb, vb, ib, exclude_self)
    inv_p = g / jnp.maximum(p, 1.0)              # (TR, 1): cotangent / P_i
    dpos = inv_p * (1.0 - ez / (ez + ns))
    dneg = -inv_p * s * ez
    return (pos * dpos + neg * dneg) * inv_temp


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _infonce_rows(fa, la, va, ia, fb, lb, vb, ib, inv_temp, exclude_self):
    l_row, _, _, _ = _fwd_call_v2(fa, la, va, ia, fb, lb, vb, ib,
                                  inv_temp=inv_temp, exclude_self=exclude_self)
    return l_row


def _infonce_rows_fwd(fa, la, va, ia, fb, lb, vb, ib, inv_temp, exclude_self):
    l_row, ns, s, p = _fwd_call_v2(fa, la, va, ia, fb, lb, vb, ib,
                                   inv_temp=inv_temp, exclude_self=exclude_self)
    return l_row, (fa, la, va, ia, fb, lb, vb, ib, ns, s, p)


def _infonce_rows_bwd(inv_temp, exclude_self, res, g):
    fa, la, va, ia, fb, lb, vb, ib, ns, s, p = res
    dfa, dfb = _bwd_call_v2(fa, la, va, ia, fb, lb, vb, ib, g, ns, s, p,
                            inv_temp=inv_temp, exclude_self=exclude_self)
    return (dfa, None, None, None, dfb, None, None, None)


_infonce_rows.defvjp(_infonce_rows_fwd, _infonce_rows_bwd)


def _l2_normalize(x, eps=1e-12):
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    safe = jnp.where(sq > 0, sq, 1.0)
    out = x / jnp.maximum(jnp.sqrt(safe), eps)
    return jnp.where(sq > 0, out, 0.0)


def _pad_rows(x, m, fill=0):
    pad = m - x.shape[0]
    if pad == 0:
        return x
    cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, cfg, constant_values=fill)


def _masked_infonce_pallas(fa, la, va, fb, lb, vb, *, temperature,
                           exclude_self):
    m_a = _round_up(fa.shape[0], TILE)
    m_b = _round_up(fb.shape[0], TILE)
    n_rows_valid = jnp.sum(va.astype(jnp.float32))
    fa_n = _l2_normalize(fa.astype(jnp.float32))
    fb_n = _l2_normalize(fb.astype(jnp.float32))
    ia = jnp.arange(m_a, dtype=jnp.int32)
    ib = jnp.arange(m_b, dtype=jnp.int32)
    args = (_pad_rows(fa_n, m_a), _pad_rows(la.astype(jnp.int32), m_a),
            _pad_rows(va, m_a, False), ia,
            _pad_rows(fb_n, m_b), _pad_rows(lb.astype(jnp.int32), m_b),
            _pad_rows(vb, m_b, False), ib)
    l_row = _infonce_rows(*args, float(1.0 / temperature), exclude_self)
    va_f = _pad_rows(va, m_a, False).astype(jnp.float32)
    total = jnp.sum(l_row * va_f)
    return -total / jnp.maximum(n_rows_valid, 1.0)


def masked_infonce_pallas(features, labels, valid, *, temperature):
    """Self-contrast InfoNCE, fused TPU kernel (drop-in for
    ops.infonce.masked_infonce)."""
    return _masked_infonce_pallas(features, labels, valid,
                                  features, labels, valid,
                                  temperature=temperature, exclude_self=True)


def masked_infonce_cross_pallas(features_a, labels_a, valid_a,
                                features_b, labels_b, valid_b, *,
                                temperature):
    """Cross-scale InfoNCE, fused TPU kernel (drop-in for
    ops.infonce.masked_infonce_cross)."""
    return _masked_infonce_pallas(features_a, labels_a, valid_a,
                                  features_b, labels_b, valid_b,
                                  temperature=temperature, exclude_self=False)


# ===========================================================================
# v2 kernels: column-set resident in VMEM (loaded once), fori column chunks.
# The v1 grid reloads the full column set from HBM once per (row tile, phase)
# — 2 * R * M * C traffic; v2 loads it once and streams only row tiles.
# ===========================================================================

_CHUNK = 2048  # max column chunk per inner iteration (TILE x chunk logits)


def _pick_chunk_v2(m: int) -> int:
    for c in (_CHUNK, 1024, 512, 256):
        if m % c == 0:
            return c
    return m


def _fwd_kernel_v2(fa_ref, la_ref, va_ref, ia_ref,
                   fb_ref, lb_ref, vb_ref, ib_ref,
                   out_l_ref, out_ns_ref, out_s_ref, out_p_ref,
                   *, inv_temp: float, exclude_self: bool, m_b: int,
                   chunk: int):
    n_chunks = m_b // chunk
    fa = fa_ref[:]
    la, va, ia = la_ref[:], va_ref[:], ia_ref[:]

    def z_masks(c):
        off = c * chunk
        fb = fb_ref[pl.ds(off, chunk), :]
        z = jax.lax.dot_general(fa, fb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * inv_temp
        pos, neg = _masks(la, va, ia,
                          lb_ref[pl.ds(off, chunk), :],
                          vb_ref[pl.ds(off, chunk), :],
                          ib_ref[pl.ds(off, chunk), :], exclude_self)
        return z, pos, neg

    def pass_a(c, carry):
        ns, p = carry
        z, pos, neg = z_masks(c)
        ns = ns + jnp.sum(jnp.exp(z) * neg, axis=1, keepdims=True)
        p = p + jnp.sum(pos, axis=1, keepdims=True)
        return ns, p

    zero = jnp.zeros((fa.shape[0], 1), jnp.float32)
    ns, p = jax.lax.fori_loop(0, n_chunks, pass_a, (zero, zero))

    def pass_b(c, carry):
        num, s = carry
        z, pos, _ = z_masks(c)
        denom = jnp.exp(z) + ns
        num = num + jnp.sum(pos * (z - jnp.log(denom)), axis=1, keepdims=True)
        s = s + jnp.sum(pos / denom, axis=1, keepdims=True)
        return num, s

    num, s = jax.lax.fori_loop(0, n_chunks, pass_b, (zero, zero))
    out_l_ref[:] = num / jnp.maximum(p, 1.0)
    out_ns_ref[:] = ns
    out_s_ref[:] = s
    out_p_ref[:] = p


def _resident_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


# Hard ceiling we are willing to hand Mosaic (below the 128 MB physical
# VMEM per core to leave scratch/tile headroom).
PALLAS_VMEM_CAP = 100 << 20


def vmem_need_bytes(m_resident: int, c_dim: int) -> int:
    """Estimated scoped-VMEM bytes the v2 kernel needs at column count
    ``m_resident`` and feature dim ``c_dim`` (mirrors _v2_compiler_params)."""
    resident = m_resident * (c_dim + 8) * 4          # feats + 8 scalar cols
    # Mosaic's stack accounting charges several times the resident bytes
    # once chunk z/mask temporaries are included (measured 47.05 MB at
    # M=10240, c=256, where resident = 10.3 MB); budget 4x + fixed headroom.
    return 4 * resident + (24 << 20)


def fits_vmem(m_resident: int, c_dim: int) -> bool:
    """True when the VMEM-resident kernel can compile at this size.

    Used by DenseContrastiveLossV2._use_pallas so 'auto' never selects a
    kernel that would fail compilation (falls back to the streamed XLA
    path instead); roughly m_resident*(c_dim+8) <= 4.98M, i.e. M <= ~18.9k
    at c=256."""
    return vmem_need_bytes(m_resident, c_dim) <= PALLAS_VMEM_CAP


def _v2_compiler_params(m_resident: int, c_dim: int):
    """The v2 design keeps the whole column set VMEM-resident; above
    M≈8k the resident features alone exceed the DEFAULT 16 MB scoped-vmem
    limit (paper configs run max_features_total=10000).  v5e/v4 have
    128 MB VMEM per core — raise the cap to what the kernel actually
    needs plus tile/scratch headroom."""
    need = vmem_need_bytes(m_resident, c_dim)
    return pltpu.CompilerParams(
        vmem_limit_bytes=max(16 << 20, min(need, PALLAS_VMEM_CAP)))


def _fwd_call_v2(fa, la, va, ia, fb, lb, vb, ib, *, inv_temp, exclude_self):
    m_a, c_dim = fa.shape
    m_b = fb.shape[0]
    rows = m_a // TILE

    def col(x):
        return x.reshape(-1, 1).astype(jnp.int32)

    row_spec = pl.BlockSpec((TILE, 1), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel_v2, inv_temp=inv_temp,
                          exclude_self=exclude_self, m_b=m_b,
                          chunk=_pick_chunk_v2(m_b)),
        grid=(rows,),
        in_specs=[
            pl.BlockSpec((TILE, c_dim), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec,
            _resident_spec(), _resident_spec(), _resident_spec(),
            _resident_spec(),
        ],
        out_specs=[row_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((m_a, 1), jnp.float32)] * 4,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * m_a * m_b * c_dim,
            bytes_accessed=(m_a * 2 + m_b) * c_dim * 4,
            transcendentals=2 * m_a * m_b),
        compiler_params=_v2_compiler_params(m_b, c_dim),
        interpret=_interpret(),
    )(fa, col(la), col(va), col(ia), fb, col(lb), col(vb), col(ib))
    l_row, ns, s, p = outs
    return l_row[:, 0], ns, s, p


def _bwd_dab_kernel_v2(fa_ref, la_ref, va_ref, ia_ref,
                       fb_ref, lb_ref, vb_ref, ib_ref,
                       g_ref, ns_ref, s_ref, p_ref,
                       da_ref, db_ref,
                       *, inv_temp, exclude_self, m_b, chunk):
    """Fused backward: ONE pass over the z tiles yields BOTH gradients.

    Grid iterates row tiles sequentially (TPU pallas grids are sequential
    on a core), so ``db`` lives as a constant-index VMEM-resident output
    accumulated across grid steps — da kernel + db kernel each recomputed
    every z tile before; fusing removes one full M² z recompute and one
    full M² mask/exp pass (25% fewer bwd MXU flops, half the VPU work)."""
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _():
        db_ref[:] = jnp.zeros_like(db_ref)

    n_chunks = m_b // chunk
    fa = fa_ref[:]
    la, va, ia = la_ref[:], va_ref[:], ia_ref[:]
    g, ns, s, p = g_ref[:], ns_ref[:], s_ref[:], p_ref[:]

    def body(c, acc):
        off = c * chunk
        fb = fb_ref[pl.ds(off, chunk), :]
        dz = _dz_tile(fa, fb, la, va, ia,
                      lb_ref[pl.ds(off, chunk), :],
                      vb_ref[pl.ds(off, chunk), :],
                      ib_ref[pl.ds(off, chunk), :],
                      g, ns, s, p, inv_temp=inv_temp,
                      exclude_self=exclude_self)
        db_ref[pl.ds(off, chunk), :] += jax.lax.dot_general(
            dz, fa, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc + jnp.dot(dz, fb, preferred_element_type=jnp.float32)

    da_ref[:] = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros(fa.shape, jnp.float32))


def _bwd_call_v2(fa, la, va, ia, fb, lb, vb, ib, g, ns, s, p,
                 *, inv_temp, exclude_self):
    m_a, c_dim = fa.shape
    m_b = fb.shape[0]

    def col(x, dt=jnp.int32):
        return x.reshape(-1, 1).astype(dt)

    la2, va2, ia2 = col(la), col(va), col(ia)
    lb2, vb2, ib2 = col(lb), col(vb), col(ib)
    g2 = g.reshape(-1, 1).astype(jnp.float32)
    row = pl.BlockSpec((TILE, 1), lambda r: (r, 0), memory_space=pltpu.VMEM)
    res = _resident_spec()

    dfa, dfb = pl.pallas_call(
        functools.partial(_bwd_dab_kernel_v2, inv_temp=inv_temp,
                          exclude_self=exclude_self, m_b=m_b,
                          chunk=_pick_chunk_v2(m_b)),
        grid=(m_a // TILE,),
        in_specs=[pl.BlockSpec((TILE, c_dim), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
                  row, row, row, res, res, res, res, row, row, row, row],
        out_specs=[pl.BlockSpec((TILE, c_dim), lambda r: (r, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((m_b, c_dim), lambda r: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((m_a, c_dim), jnp.float32),
                   jax.ShapeDtypeStruct((m_b, c_dim), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * m_a * m_b * c_dim,
            bytes_accessed=(m_a * 2 + m_b * 2) * c_dim * 4,
            transcendentals=m_a * m_b),
        compiler_params=_v2_compiler_params(2 * m_b, c_dim),
        interpret=_interpret(),
    )(fa, la2, va2, ia2, fb, lb2, vb2, ib2, g2, ns, s, p)
    return dfa, dfb
