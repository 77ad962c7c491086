"""Throughput of all three paper recipes on the local chip (bf16 default).

bench.py reports the flagship (Cityscapes HRNet-W48 MS-CS); this measures
the other two paper recipes the same way for PERF.md breadth:

  python tools/recipe_bench.py upnswin     # UPerNet Swin-T + TwoScale + MS-CS
  python tools/recipe_bench.py hrnetocr    # OCRNet HRNet-W48 + MS-CS
  python tools/recipe_bench.py hrnet       # flagship, for cross-checking
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RECIPES = {
    "hrnet": (
        {"model": "HRNet", "dataset": "CITYSCAPES", "backbone": "hrnet48",
         "align_corners": True,
         "ms_projector": {"mlp": [[1, -1, 1]], "scales": 4, "d": 256,
                          "use_bn": True}},
        {"dataset": "CITYSCAPES", "experiment": 1, "device": None,
         "temperature": 0.1, "cross_scale_contrast": True,
         "weights": [1, 0.7, 0.4, 0.1], "scales": 4,
         "losses": {"CrossEntropyLoss": 1, "DenseContrastiveLossV2_ms": 0.1},
         "min_views_per_class": 5, "max_views_per_class": 2500,
         "max_features_total": 2048}),
    "upnswin": (
        {"model": "UPerNet", "dataset": "ADE20K", "backbone": "swinT",
         "align_corners": False, "drop_path_rate": 0.3,
         "aux_head": {"in_index": 3},
         "ms_projector": {"mlp": [[1, -1, 1]], "scales": 4, "d": 256,
                          "use_bn": True, "position": "backbone"}},
        {"dataset": "ADE20K", "experiment": 1, "device": None,
         "temperature": 0.1, "cross_scale_contrast": True,
         "weights": [1, 0.7, 0.4, 0.1], "scales": 4,
         "losses": {"TwoScaleLoss": 1, "DenseContrastiveLossV2_ms": 0.1},
         "interm_weight": 0.4, "min_views_per_class": 5,
         "max_views_per_class": 2500, "max_features_total": 2048}),
    "hrnetocr": (
        {"model": "OCRNet", "dataset": "ADE20K", "backbone": "hrnet48",
         "align_corners": True,
         "ms_projector": {"mlp": [[1, -1, 1]], "scales": 4, "d": 256,
                          "use_bn": True}},
        {"dataset": "ADE20K", "experiment": 1, "device": None,
         "temperature": 0.1, "cross_scale_contrast": True,
         "weights": [1, 0.7, 0.4, 0.1], "scales": 4,
         "losses": {"CrossEntropyLoss": 1, "DenseContrastiveLossV2_ms": 0.1},
         "interm_weight": 0.4, "min_views_per_class": 5,
         "max_views_per_class": 2500, "max_features_total": 2048}),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("recipe", choices=sorted(RECIPES))
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    import jax
    from __graft_entry__ import _build_train_setup, _setup_compile_cache
    _setup_compile_cache()
    from mscs_tpu.parallel import make_mesh, replicate, shard_batch
    if not args.fp32:
        from mscs_tpu.models.layers import set_compute_dtype
        set_compute_dtype("bfloat16")

    graph, loss_cfg = RECIPES[args.recipe]
    state, step, batch = _build_train_setup(
        dict(graph), dict(loss_cfg), batch=args.bs, hw=args.hw)
    mesh = make_mesh()
    state = replicate(mesh, state)
    batch = shard_batch(mesh, batch)
    stepj = jax.jit(step, donate_argnums=(0,))
    rng = jax.random.key(0)
    state, logs = stepj(state, batch, rng, 0)
    jax.block_until_ready(logs["loss"])
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        state, logs = stepj(state, batch, rng, 0)
    jax.block_until_ready(logs["loss"])
    dt = time.perf_counter() - t0
    print(f"{args.recipe} bs{args.bs} {args.hw}^2 "
          f"{'fp32' if args.fp32 else 'bf16'}: "
          f"{args.bs * n / dt:.1f} img/s ({dt / n * 1000:.1f} ms/step)")


if __name__ == "__main__":
    main()
