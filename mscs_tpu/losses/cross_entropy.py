"""Cross-entropy with ignore-index and per-class weights, torch-semantics.

Matches ``torch.nn.CrossEntropyLoss(weight=w, ignore_index=i)`` exactly:
weighted mean = sum(w[y]*nll) / sum(w[y]) over non-ignored pixels.
Used by the reference via LossWrapper (``losses/LossWrapper.py:20-31``) with
hard-coded Cityscapes class weights.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Reference losses/LossWrapper.py:26-28 — the 19 Cityscapes CE class weights.
CITYSCAPES_CE_WEIGHTS = (
    0.8373, 0.918, 0.866, 1.0345, 1.0166, 0.9969, 0.9754, 1.0489,
    0.8786, 1.0023, 0.9539, 0.9843, 1.1116, 0.9037, 1.0865, 1.0955,
    1.0865, 1.1529, 1.0507,
)


def cross_entropy(logits: jnp.ndarray, target: jnp.ndarray, *,
                  ignore_index: int = -100,
                  class_weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """:param logits: (N, H, W, C) raw scores
    :param target: (N, H, W) int labels; entries == ignore_index are excluded
    """
    c = logits.shape[-1]
    logits = logits.astype(jnp.float32)  # bf16-activation models
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = target.astype(jnp.int32)
    # out-of-range labels are excluded like the ignore id (torch would raise
    # on them; they appear here only as eval-time bucket padding, which must
    # contribute nothing — trainer._pad_to_bucket)
    valid = (tgt != ignore_index) & (tgt >= 0) & (tgt < c)
    tgt_safe = jnp.where(valid, tgt, 0)
    # one-hot multiply instead of take_along_axis: per-pixel gathers over the
    # class axis cost ~47 ms/step at 8x512x512x19 on TPU (profile-driven; the
    # same pathology as the confusion-matrix scatter)
    onehot = jax.nn.one_hot(tgt_safe, c, dtype=logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    if class_weights is not None:
        w = jnp.sum(jnp.asarray(class_weights, logp.dtype) * onehot, axis=-1)
    else:
        w = jnp.ones_like(nll)
    w = jnp.where(valid, w, 0.0)
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-12)
