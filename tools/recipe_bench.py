"""Throughput of all three paper recipes on the local chip (bf16 default).

bench.py reports the flagship (Cityscapes HRNet-W48 MS-CS); this measures
all three paper recipes the same way, built from the SHIPPED config files
(so the graph/loss really are the paper's), for PERF.md breadth:

  python tools/recipe_bench.py upnswin     # UPerNet Swin-T + TwoScale + MS-CS
  python tools/recipe_bench.py hrnetocr    # OCRNet HRNet-W48 + TwoScale + MS-CS
  python tools/recipe_bench.py hrnet       # flagship (cross-check vs bench.py)
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RECIPES = {
    "hrnet": "configs/CITYSCAPES/hrnet_contrastive_CTS.json",
    "upnswin": "configs/ADE20K/upnswin_contrastive_ADE20K.json",
    "hrnetocr": "configs/ADE20K/hrnetocr_contrastive_ADE20K.json",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("recipe", choices=sorted(RECIPES))
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--max-features", type=int, default=2048,
                    help="cap on loss.max_features_total; pass 10000 for "
                         "the exact paper configs")
    ap.add_argument("--infonce", choices=["xla", "pallas"], default=None,
                    help="override loss.infonce_impl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from __graft_entry__ import _setup_compile_cache
    _setup_compile_cache()
    from mscs_tpu.config import graph_config, loss_config, parse_config
    from mscs_tpu.data.datasets_info import num_real_classes
    from mscs_tpu.losses import LossWrapper
    from mscs_tpu.models import build_model
    from mscs_tpu.parallel import make_mesh, replicate, shard_batch
    from mscs_tpu.train import (TrainState, build_optimizer, make_lr_schedule,
                                make_train_step, output_flags)
    if not args.fp32:
        from mscs_tpu.models.layers import set_compute_dtype
        set_compute_dtype("bfloat16")

    cfg = parse_config(RECIPES[args.recipe], user="c", device=-1,
                       dataset=-1, parallel=False)
    cfg["graph"].pop("pretrained", None)  # no checkpoint files in-env
    graph = graph_config(cfg)
    lw_cfg = loss_config(cfg)
    lw_cfg["max_features_total"] = min(
        lw_cfg.get("max_features_total", 2048), args.max_features)
    if args.infonce:
        lw_cfg["infonce_impl"] = args.infonce
    experiment = cfg["data"]["experiment"]
    n_cls = num_real_classes(cfg["data"]["dataset"], experiment)

    model = build_model(graph, experiment=experiment)
    wrapper = LossWrapper.from_config(lw_cfg)
    x = jnp.ones((args.bs, args.hw, args.hw, 3), jnp.float32)
    y = jnp.asarray(np.random.default_rng(0).integers(
        0, n_cls, (args.bs, args.hw, args.hw)), jnp.int32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), x, train=False)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    print(f"{args.recipe}: {n_params / 1e6:.1f}M params")
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
    batch = {"image": x, "label": y}
    mesh = make_mesh()
    state = replicate(mesh, state)
    batch = shard_batch(mesh, batch)
    stepj = jax.jit(step, donate_argnums=(0,))
    rng = jax.random.key(0)
    state, logs = stepj(state, batch, rng, 0)
    jax.block_until_ready(logs["loss"])
    first = float(logs["loss"])
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        state, logs = stepj(state, batch, rng, 0)
    jax.block_until_ready(logs["loss"])
    dt = time.perf_counter() - t0
    print(f"loss {first:.4f} -> {float(logs['loss']):.4f} over {n} steps")
    print(f"{args.recipe} bs{args.bs} {args.hw}^2 "
          f"{'fp32' if args.fp32 else 'bf16'}: "
          f"{args.bs * n / dt:.1f} img/s ({dt / n * 1000:.1f} ms/step)")


if __name__ == "__main__":
    main()
