"""Lovász-Softmax in fixed-shape JAX.

Reference semantics (``losses/LovaszSoftmax.py``): softmax -> per-class
|fg - p_c| errors over the non-ignored pixels -> descending sort -> dot with
the Jaccard-extension gradient (cumsum form).  'present' mode averages only
over classes that appear in the labels.

TPU redesign: the reference drops ignored pixels dynamically; here they stay
in place with error forced to 0 and fg 0 — zero-error pixels sort to the end
and multiply zero error, so the loss value is unchanged (proved in tests
against the torch implementation).  The per-class sorts run as ONE batched
``lax.sort`` over a (C, P) array.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _lovasz_grad_batched(fg_sorted: jnp.ndarray) -> jnp.ndarray:
    """(C, P) sorted foreground indicators -> (C, P) Jaccard gradient."""
    gts = jnp.sum(fg_sorted, axis=1, keepdims=True)
    intersection = gts - jnp.cumsum(fg_sorted, axis=1)
    union = gts + jnp.cumsum(1.0 - fg_sorted, axis=1)
    jaccard = 1.0 - intersection / union
    return jnp.concatenate(
        [jaccard[:, :1], jaccard[:, 1:] - jaccard[:, :-1]], axis=1)


def _lovasz_softmax_flat(prob: jnp.ndarray, lbl: jnp.ndarray,
                         valid: jnp.ndarray, classes: str) -> jnp.ndarray:
    """prob (P, C), lbl (P,), valid (P,) bool."""
    c = prob.shape[1]
    fg = (lbl[None, :] == jnp.arange(c, dtype=lbl.dtype)[:, None])
    fg = (fg & valid[None, :]).astype(prob.dtype)          # (C, P)
    errors = jnp.abs(fg - prob.T) * valid[None, :].astype(prob.dtype)
    # descending sort by error, carrying fg — one batched sort for all classes
    neg_err_sorted, fg_sorted = jax.lax.sort(
        (-errors, fg), dimension=-1, num_keys=1)
    errors_sorted = -neg_err_sorted
    per_class = jnp.sum(errors_sorted * _lovasz_grad_batched(fg_sorted), axis=1)
    if classes == "present":
        present = jnp.sum(fg, axis=1) > 0
        n = jnp.sum(present.astype(prob.dtype))
        return jnp.sum(jnp.where(present, per_class, 0.0)) / jnp.maximum(n, 1.0)
    if not isinstance(classes, str):
        # explicit class-id list (ref LovaszSoftmax.py:22,51): average the
        # requested classes only, absent-or-not
        sel = jnp.zeros((c,), bool).at[jnp.asarray(list(classes))].set(True)
        n = jnp.sum(sel.astype(prob.dtype))
        return jnp.sum(jnp.where(sel, per_class, 0.0)) / jnp.maximum(n, 1.0)
    # 'all': every real class contributes, absent ones via the max-prob
    # term the Jaccard grad [1, 0, ...] produces — same as the reference
    return jnp.mean(per_class)


def lovasz_softmax(logits: jnp.ndarray, target: jnp.ndarray, *,
                   ignore_index: int | None = None,
                   classes_to_consider="present",
                   per_image: bool = False) -> jnp.ndarray:
    """:param logits: (N, H, W, C); :param target: (N, H, W) int."""
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    c = prob.shape[-1]
    flat_p = prob.reshape(-1, c) if not per_image else prob.reshape(prob.shape[0], -1, c)
    flat_l = target.reshape(-1) if not per_image else target.reshape(target.shape[0], -1)
    # out-of-range labels (eval-time bucket padding) are always excluded;
    # upstream never produces them, so in-range behaviour is unchanged
    valid = (flat_l >= 0) & (flat_l < c)
    if ignore_index is not None:
        valid &= flat_l != ignore_index
    if per_image:
        fn = jax.vmap(lambda p, l, v: _lovasz_softmax_flat(p, l, v, classes_to_consider))
        return jnp.mean(fn(flat_p, flat_l, valid))
    return _lovasz_softmax_flat(flat_p, flat_l, valid, classes_to_consider)
