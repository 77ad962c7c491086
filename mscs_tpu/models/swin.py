"""Swin Transformer backbone (dense-prediction variant) in Flax NHWC.

Capability parity with reference ``models/Swin.py`` (the MSRA/mmseg Swin for
segmentation): 4x4 conv patch embed with patch-norm, windowed attention with
relative position bias, shifted windows via roll + region mask, pad-to-window
for arbitrary input sizes, PatchMerging downsampling, stochastic depth with
linear rate schedule, per-out-index LayerNorm, T/S/B/L variants hardcoded
(ref ``backbone_config``, Swin.py:21-94).

TPU-first notes: everything NHWC, window partition is a reshape/transpose
(no gathers), shift is ``jnp.roll``, attention masks are computed at trace
time with numpy (static shapes).  Use ``remat=True`` per stage instead of
torch checkpointing.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

SWIN_VARIANTS = {
    "swinT": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "swinS": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "swinB": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    "swinL": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)),
}


def _relative_position_index(ws: int) -> np.ndarray:
    """(ws², ws²) indices into the (2ws-1)² relative-position-bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]          # 2, N, N
    rel = rel.transpose(1, 2, 0) + (ws - 1)            # shift to >= 0
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """(num_windows, ws², ws²) additive mask (0 / -100) for SW-MSA."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for h_sl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w_sl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[h_sl, w_sl] = cnt
            cnt += 1
    win = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    mask = win[:, None, :] != win[:, :, None]
    return np.where(mask, -100.0, 0.0).astype(np.float32)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics)."""
    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if not train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def resolve_attn_impl(impl: str, attn_drop: float, train: bool,
                      n_windows: int = 0) -> str:
    """'auto' picks the fused Pallas window-attention kernel on TPU.

    The kernel (ops/pallas_window_attn.py) does not implement attention
    dropout, so auto falls back to XLA when ``attn_drop > 0`` and training.
    Wide window grids (whole-image TTA shapes, e.g. 28x55 windows) are
    handled by the kernel's footprint-derived vmem limit (r5) — no
    grid-size fallback needed.
    """
    del n_windows  # kept for call-site stability; not a fallback axis
    if impl in ("pallas", "xla"):
        return impl
    if attn_drop > 0.0 and train:
        return "xla"
    return ("pallas" if jax.default_backend() in ("tpu", "axon")
            else "xla")


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None,
                 train: bool = False) -> jnp.ndarray:
        """x: (num_windows*B, N, C) — XLA path — or (B, Hp, Wp, C) NHWC,
        which dispatches to the fused Pallas kernel (window partitioning
        happens inside the kernel; mask: (num_windows, N, N) or None)."""
        ws = self.window_size
        n = ws * ws
        c = x.shape[-1]
        head_dim = c // self.num_heads
        scale = head_dim ** -0.5
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads))
        idx = jnp.asarray(_relative_position_index(ws).reshape(-1))
        bias = table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)

        if x.ndim == 4:
            from mscs_tpu.ops.pallas_window_attn import window_attention_nhwc
            qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, name="qkv")(x)
            q, k, v = (qkv[..., i * c:(i + 1) * c] for i in range(3))
            out = window_attention_nhwc(q, k, v, bias, mask,
                                        num_heads=self.num_heads,
                                        window_size=ws)
            out = nn.Dense(c, name="proj")(out)
            return nn.Dropout(self.proj_drop, deterministic=not train,
                              name="proj_drop")(out)

        bnw = x.shape[0]
        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(bnw, n, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bnw, self.num_heads, n, n)
        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        attn = nn.Dropout(self.attn_drop, deterministic=not train,
                          name="attn_drop")(attn)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(bnw, n, c)
        out = nn.Dense(c, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=not train,
                          name="proj_drop")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float
    qkv_bias: bool
    drop_path: float
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    attn_impl: str = "auto"  # 'auto' | 'pallas' | 'xla'

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        """x: (B, H, W, C)."""
        b, h, w, c = x.shape
        # Reference semantics (seg-variant Swin, ref models/Swin.py:295-332):
        # the window is NEVER clamped to the feature size — small maps are
        # zero-padded up to a window multiple, padded tokens attend freely in
        # non-shifted blocks, and the shift/mask machinery runs unchanged.
        # (Keeps the bias table at its checkpoint shape (2ws-1)² everywhere.)
        ws = self.window_size
        shift = self.shift_size

        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
        else:
            mask = None
        attn = WindowAttention(self.dim, ws, self.num_heads, self.qkv_bias,
                               attn_drop=self.attn_drop_rate,
                               proj_drop=self.drop_rate,
                               name="attn")
        impl = resolve_attn_impl(self.attn_impl, self.attn_drop_rate, train,
                                 n_windows=(hp // ws) * (wp // ws))
        if impl == "pallas":
            # fused kernel: window partition/unpartition happen inside
            # (ops/pallas_window_attn.py), no (B*nW, N, C) round trip
            y = attn(y, mask, train)
        else:
            # window partition: reshape + transpose only
            y = y.reshape(b, hp // ws, ws, wp // ws, ws, c)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
            y = attn(y, mask, train)
            y = y.reshape(b, hp // ws, wp // ws, ws, ws, c)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :h, :w]
        x = shortcut + DropPath(self.drop_path, name="dp1")(y, train)

        z = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        z = nn.Dense(int(c * self.mlp_ratio), name="mlp_fc1")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dropout(self.drop_rate, deterministic=not train,
                       name="mlp_drop1")(z)
        z = nn.Dense(c, name="mlp_fc2")(z)
        z = nn.Dropout(self.drop_rate, deterministic=not train,
                       name="mlp_drop2")(z)
        return x + DropPath(self.drop_path, name="dp2")(z, train)


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Returns a list of NHWC feature maps at the requested out_indices."""
    variant: str = "swinT"
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.3
    ape: bool = False  # absolute position embedding (ref Swin.py:547,589-597)
    pretrain_img_size: int = 224
    patch_norm: bool = True
    out_indices: tuple = (0, 1, 2, 3)
    frozen_stages: int = -1
    # remat granularity (graph.use_checkpoint): False = none; True/'all' =
    # every block (the torch use_checkpoint analogue, ref Swin.py:470-473);
    # 'stageK' = only stage K's blocks (e.g. 'stage2' remats the deep
    # 18-block stage of S/B/L variants — most of the activation memory for
    # a fraction of the recompute)
    remat: bool | str = False
    attn_impl: str = "auto"  # 'auto' | 'pallas' | 'xla'

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list[jnp.ndarray]:
        spec = SWIN_VARIANTS[self.variant]
        embed_dim, depths, num_heads = (spec["embed_dim"], spec["depths"],
                                        spec["num_heads"])
        # patch embed: 4x4 conv stride 4 (pad input to multiple of 4)
        b, h, w, _ = x.shape
        x = jnp.pad(x, ((0, 0), (0, (4 - h % 4) % 4), (0, (4 - w % 4) % 4),
                        (0, 0)))
        x = nn.Conv(embed_dim, (4, 4), strides=(4, 4), padding="VALID",
                    name="patch_embed")(x)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)
        if self.ape:
            # ref Swin.py:589-597: trunc-normal (1,C,H0,W0) embed, bicubic
            # resized to the feature grid and added after patch embed.  NHWC
            # here; jax.image.resize's cubic path is weight-matrix matmuls.
            g = self.pretrain_img_size // 4
            pe = self.param("absolute_pos_embed",
                            nn.initializers.truncated_normal(0.02),
                            (1, g, g, x.shape[-1]))
            pe = jax.image.resize(pe, (1, x.shape[1], x.shape[2], x.shape[3]),
                                  method="bicubic")
            x = x + pe.astype(x.dtype)
        x = nn.Dropout(self.drop_rate, deterministic=not train,
                       name="pos_drop")(x)

        total_depth = sum(depths)
        dpr = np.linspace(0, self.drop_path_rate, total_depth)
        # ADVICE r4: an unknown remat value ('stage9', 'Stage2', 'true')
        # would otherwise silently disable rematerialization and surface as
        # an unexplained OOM instead of an error.
        valid_remat = {False, True, "all"} | {
            f"stage{s}" for s in range(len(depths))}
        if self.remat not in valid_remat:
            raise ValueError(
                f"graph.use_checkpoint={self.remat!r} not in "
                f"{sorted(map(str, valid_remat))}")
        # frozen_stages (ref Swin.py:637-652): stop gradients into the patch
        # embed (>=0) and the first k stages (>=2 freezes stages 0..k-2).
        # NOTE: pair with zero weight decay on frozen params (opt_keys) —
        # gradient stopping alone does not stop decoupled decay.
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        outs = []
        blk_id = 0
        for stage, depth in enumerate(depths):
            dim = embed_dim * (2 ** stage)
            stage_remat = (self.remat in (True, "all")
                           or self.remat == f"stage{stage}")
            for d in range(depth):
                block_cls = (nn.remat(SwinBlock, static_argnums=(2,))
                             if stage_remat else SwinBlock)
                x = block_cls(
                    dim=dim, num_heads=num_heads[stage],
                    window_size=self.window_size,
                    shift_size=0 if d % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    drop_path=float(dpr[blk_id]),
                    drop_rate=self.drop_rate,
                    attn_drop_rate=self.attn_drop_rate,
                    attn_impl=self.attn_impl,
                    name=f"stage{stage}_block{d}")(x, train)
                blk_id += 1
            if self.frozen_stages >= 2 and stage < self.frozen_stages - 1:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                out = nn.LayerNorm(epsilon=1e-5, name=f"norm{stage}")(x)
                outs.append(out)
            if stage < len(depths) - 1:
                x = PatchMerging(dim, name=f"merge{stage}")(x)
        return outs
