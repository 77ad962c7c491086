"""Fixed-shape per-class anchor sampling for the dense contrastive loss.

TPU-native redesign of reference ``losses/DenseContrastiveLossV2.py:86-125``
(`sample_anchors_fast`).  The reference builds data-dependent shapes
(T present (image, class) pairs × V views, both runtime values) and runs a
Python loop with one `randperm` per class.  XLA needs static shapes, so here:

- T and V stay *runtime scalars* (traced), but all buffers have a static slot
  capacity ``M = round_up(max_features_total)``; slots beyond T*V are masked.
- The per-class random permutations are produced by ONE batched
  ``lax.sort`` per image over pixel keys (class id primary, random bits
  secondary) — after the sort, the pixels of each class form a contiguous
  block in uniformly random order.  Slot (t, v) then reads
  ``sorted_idx[n_t, class_start[n_t, c_t] + v]``: pure gathers, no loops.

Semantics preserved exactly (validated against a torch oracle in tests):
- per-(image, class) pixel counts via one-hot compare (ref :101-103)
- drop the LAST class column before the min-views filter (ref :106 uses
  ``cls_counts[:, :-1]`` unconditionally — kept as-is, including for
  experiments without an ignore class)
- V = min(min_count_over_present_pairs, max_views_per_class) with the
  ``max_views_per_class == 1`` no-cap quirk, then the total-feature cap
  V = max_features_total // T when V*T exceeds it (ref :64-84)
- pair enumeration order is row-major over (image, class) like torch.where
  (ref :106-107)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class AnchorSample(NamedTuple):
    """Slot-flattened anchor set. Slot m = t * views + v (t-major, like the
    reference's (T, V, C) -> (T*V, C) flatten)."""
    features: jnp.ndarray   # (M, C) float — gathered, NOT yet L2-normalised
    labels: jnp.ndarray     # (M,) int32 class id per slot (0 where invalid)
    valid: jnp.ndarray      # (M,) bool
    num_pairs: jnp.ndarray  # () int32 — T: present (image, class) pairs
    views: jnp.ndarray      # () int32 — V: views per class actually used


def anchor_capacity(max_features_total: int) -> int:
    """Static slot capacity for the given config. 128-multiple for MXU tiles."""
    return _round_up(max(int(max_features_total), 128), 128)


def sample_anchors(
    rng: jax.Array,
    dominant_classes: jnp.ndarray,  # (N, H, W) or (N, HW) int
    features: jnp.ndarray,          # (N, H, W, C) or (N, HW, C) float
    *,
    num_all_classes: int,
    min_views_per_class: int = 5,
    max_views_per_class: int = 2500,
    max_features_total: int = 10000,
) -> AnchorSample:
    n = dominant_classes.shape[0]
    dom = dominant_classes.reshape(n, -1).astype(jnp.int32)       # (N, HW)
    feats = features.reshape(n, dom.shape[1], features.shape[-1])  # (N, HW, C)
    hw = dom.shape[1]
    k = num_all_classes
    m_cap = anchor_capacity(max_features_total)

    # ---- 1) per-(image, class) counts --------------------------------------
    counts = jnp.zeros((n, k), jnp.int32).at[
        jnp.arange(n)[:, None], jnp.clip(dom, 0, k - 1)
    ].add(1)                                                       # (N, K)

    # ---- 2) present pairs: drop last class column, apply min-views ---------
    counts_real = counts[:, : k - 1]                               # (N, K-1)
    present = counts_real >= min_views_per_class                   # (N, K-1)
    present_flat = present.reshape(-1)
    num_pairs = jnp.sum(present_flat.astype(jnp.int32))            # T (traced)

    # Row-major present-first ordering == torch.where enumeration order.
    # stable argsort of (not present) keeps present pairs first, in order.
    order = jnp.argsort(jnp.logical_not(present_flat), stable=True)
    pair_img = (order // (k - 1)).astype(jnp.int32)                # (N*(K-1),)
    pair_cls = (order % (k - 1)).astype(jnp.int32)

    # ---- 3) views per class (reference _select_views_per_class) ------------
    big = jnp.iinfo(jnp.int32).max
    min_count = jnp.min(jnp.where(present, counts_real, big))
    if max_views_per_class == 1:   # static config quirk: no per-class cap
        views = min_count
    else:
        views = jnp.minimum(min_count, max_views_per_class)
    views = jnp.where(
        views * num_pairs > max_features_total,
        max_features_total // jnp.maximum(num_pairs, 1),
        views,
    )
    views = jnp.maximum(jnp.where(num_pairs > 0, views, 0), 0)
    views_safe = jnp.maximum(views, 1)  # for div/mod on slot ids

    # ---- 4) one sort per image = all per-class random permutations ---------
    tie = jax.random.bits(rng, (n, hw), jnp.uint32).astype(jnp.int32)
    pix = jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32), (n, hw))
    _, _, sorted_pix = jax.lax.sort((dom, tie, pix), dimension=-1, num_keys=2)
    # class c's pixels of image n live at sorted_pix[n, start[n,c] : +count]
    start = jnp.cumsum(counts, axis=1) - counts                    # (N, K) excl.

    # ---- 5) slot -> (pair, view) -> pixel gather ----------------------------
    slot = jnp.arange(m_cap, dtype=jnp.int32)
    t = slot // views_safe
    v = slot % views_safe
    valid = slot < (num_pairs * views)
    t_safe = jnp.minimum(t, n * (k - 1) - 1)
    img = pair_img[t_safe]
    cls = pair_cls[t_safe]
    pixel = sorted_pix[img, jnp.minimum(start[img, cls] + v, hw - 1)]
    out_feats = feats[img, pixel]                                  # (M, C)
    out_labels = jnp.where(valid, cls, 0)

    zero = jnp.zeros((), jnp.float32).astype(out_feats.dtype)
    out_feats = jnp.where(valid[:, None], out_feats, zero)
    return AnchorSample(out_feats, out_labels, valid,
                        num_pairs.astype(jnp.int32), views.astype(jnp.int32))
