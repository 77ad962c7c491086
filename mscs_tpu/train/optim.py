"""Optimizer construction: SGD / Adam / AdamW with key-based param groups.

Port of reference ``managers/BaseManager.py:503-567`` +
``utils/optimizer_utils.py:34-132``: torch-coupled-L2 SGD(momentum), Adam,
decoupled AdamW, and per-key ``opt_keys`` {lr_mult, wd_mult} groups (used by
the Swin recipe to zero weight decay on pos-embed / norm / relative position
bias tables).  Param-group membership = substring match on the
'/'-joined parameter path, like torch's dotted-name ``in`` test.

One naming translation keeps the match torch-faithful: our ``ConvBN``
scopes its BatchNorm as ``<x>/norm/bn/...``, but in torch those BNs live in
``nn.Sequential`` slots with NUMERIC names (``fpn.ppm_conv.0.1.weight``) —
so the upnswin recipe's ``"norm"`` opt_key does NOT zero their weight decay
upstream (only LayerNorms, whose torch names contain 'norm', get wd 0).
Matching therefore runs on the path with ``/norm/bn/`` rewritten to
``/bn/`` so ConvBN statistics params group exactly like the reference's.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import optax


def _path_str(path) -> str:
    name = "/".join(str(getattr(k, "key", k)) for k in path)
    return name.replace("/norm/bn/", "/bn/")


def _mask_for(params, predicate: Callable[[str], bool]):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: predicate(_path_str(path)), params)


def _first_matching_key(name: str, opt_keys: dict[str, dict]) -> str | None:
    for key in opt_keys:
        if key in name:
            return key
    return None


def build_optimizer(train_config: dict[str, Any], lr_schedule,
                    params_example) -> optax.GradientTransformation:
    """:param params_example: pytree used to build opt_keys masks."""
    optim = train_config.get("optim", "Adam")
    opt_keys: dict[str, dict] = train_config.get("opt_keys", {})

    def wd_mult(name: str) -> float:
        key = _first_matching_key(name, opt_keys)
        return 1.0 if key is None else float(opt_keys[key].get("wd_mult", 1.0))

    def lr_mult(name: str) -> float:
        key = _first_matching_key(name, opt_keys)
        return 1.0 if key is None else float(opt_keys[key].get("lr_mult", 1.0))

    decay_mask = _mask_for(params_example, lambda n: wd_mult(n) != 0.0)
    lr_mults = jax.tree_util.tree_map_with_path(
        lambda path, _: lr_mult(_path_str(path)), params_example)
    has_lr_mults = any(m != 1.0 for m in jax.tree.leaves(lr_mults))

    chain = []
    if optim == "SGD":
        wd = train_config.get("weight_decay", train_config.get("wd", 0.0005))
        momentum = train_config.get("momentum", 0.9)
        # torch SGD: coupled L2 (grad += wd*w) BEFORE the momentum buffer
        if wd:
            chain.append(optax.add_decayed_weights(wd, mask=decay_mask))
        chain.append(optax.trace(decay=momentum, nesterov=False))
    elif optim == "Adam":
        chain.append(optax.scale_by_adam())
    elif optim == "AdamW":
        wd = train_config.get("weight_decay", 0.01)
        betas = tuple(train_config.get("betas", (0.9, 0.999)))
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1]))
        # torch AdamW: decoupled decay scaled by lr -> apply before lr scaling
        if wd:
            chain.append(optax.add_decayed_weights(wd, mask=decay_mask))
    else:
        raise ValueError(f"optimizer {optim} not recognised")

    if has_lr_mults:
        chain.append(optax.scale_by_custom_mult(lr_mults)
                     if hasattr(optax, "scale_by_custom_mult") else
                     _scale_by_tree(lr_mults))
    chain.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*chain)


def _scale_by_tree(mults) -> optax.GradientTransformation:
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, m: u * m, updates, mults), state

    return optax.GradientTransformation(init_fn, update_fn)
