"""Shared setup: build (state, train_step, batch) from a shipped recipe config.

Used by recipe_bench.py (throughput) and profile_step.py (--recipe traces) so
both always measure the graph/loss built from the SHIPPED config files.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RECIPES = {
    "hrnet": "configs/CITYSCAPES/hrnet_contrastive_CTS.json",
    "upnswin": "configs/ADE20K/upnswin_contrastive_ADE20K.json",
    "hrnetocr": "configs/ADE20K/hrnetocr_contrastive_ADE20K.json",
}


def build_recipe_setup(recipe: str, bs: int, hw, fp32: bool = False,
                       max_features: int = 2048, infonce: str | None = None,
                       graph_overrides: dict | None = None):
    """Returns (state, step_fn, batch_dict, n_cls). Call before other jax use."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from __graft_entry__ import _setup_compile_cache
    _setup_compile_cache()
    from mscs_tpu.config import graph_config, loss_config, parse_config
    from mscs_tpu.data.datasets_info import num_real_classes
    from mscs_tpu.losses import LossWrapper
    from mscs_tpu.models import build_model
    from mscs_tpu.train import (TrainState, build_optimizer, make_lr_schedule,
                                make_train_step, output_flags)
    if not fp32:
        from mscs_tpu.models.layers import set_compute_dtype
        set_compute_dtype("bfloat16")

    cfg = parse_config(RECIPES[recipe], user="c", device=-1,
                       dataset=-1, parallel=False)
    cfg["graph"].pop("pretrained", None)  # no checkpoint files in-env
    if graph_overrides:
        cfg["graph"].update(graph_overrides)
    graph = graph_config(cfg)
    lw_cfg = loss_config(cfg)
    lw_cfg["max_features_total"] = min(
        lw_cfg.get("max_features_total", 2048), max_features)
    if infonce:
        lw_cfg["infonce_impl"] = infonce
    experiment = cfg["data"]["experiment"]
    n_cls = num_real_classes(cfg["data"]["dataset"], experiment)

    model = build_model(graph, experiment=experiment)
    wrapper = LossWrapper.from_config(lw_cfg)
    h, w = (hw, hw) if isinstance(hw, int) else hw
    x = jnp.ones((bs, h, w, 3), jnp.float32)
    y = jnp.asarray(np.random.default_rng(0).integers(
        0, n_cls, (bs, h, w)), jnp.int32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), x, train=False)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    print(f"{recipe}: {n_params / 1e6:.1f}M params")
    sched = make_lr_schedule(
        {"learning_rate": 0.01, "lr_fct": "polynomial", "lr_batchwise": True,
         "lr_params": {}}, [], 1000)
    tx = build_optimizer({"optim": "SGD", "momentum": 0.9,
                          "weight_decay": 5e-4}, sched, variables["params"])
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              batch_stats=variables.get("batch_stats", {}),
                              tx=tx)
    has_interm, has_proj = output_flags(graph)
    step = make_train_step(wrapper, n_cls, has_interm=has_interm,
                           has_proj=has_proj)
    return state, step, {"image": x, "label": y}, n_cls
