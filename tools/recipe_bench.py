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
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _recipe_setup import RECIPES  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("recipe", choices=sorted(RECIPES))
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs="+", default=[512],
                    help="crop H [W]; one value = square (the paper CTS "
                         "crop is --hw 512 1024)")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--max-features", type=int, default=2048,
                    help="cap on loss.max_features_total; pass 10000 for "
                         "the exact paper configs")
    ap.add_argument("--infonce", choices=["xla", "pallas"], default=None,
                    help="override loss.infonce_impl")
    ap.add_argument("--graph-override", default=None,
                    help='JSON dict merged into config["graph"], e.g. '
                         '\'{"use_checkpoint": true}\'')
    args = ap.parse_args()

    import jax
    from _recipe_setup import build_recipe_setup
    from mscs_tpu.parallel import make_mesh, replicate, shard_batch
    hw = args.hw[0] if len(args.hw) == 1 else tuple(args.hw[:2])
    state, step, batch, _ = build_recipe_setup(
        args.recipe, args.bs, hw, fp32=args.fp32,
        max_features=args.max_features, infonce=args.infonce,
        graph_overrides=json.loads(args.graph_override)
        if args.graph_override else None)
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
    # time at a D2H FETCH of the chained loss, not block_until_ready: the
    # tunnel has repeatedly acked readiness before execution finished
    # (bench.py r5 note; profile_step once printed 769 img/s wall against
    # 408 ms/step device time).  A value cannot reach the host before the
    # work defining it ran.
    last = float(logs["loss"])
    dt = time.perf_counter() - t0
    print(f"loss {first:.4f} -> {last:.4f} over {n} steps")
    hw_tag = (f"{hw}^2" if isinstance(hw, int) else f"{hw[0]}x{hw[1]}")
    print(f"{args.recipe} bs{args.bs} {hw_tag} "
          f"{'fp32' if args.fp32 else 'bf16'}: "
          f"{args.bs * n / dt:.1f} img/s ({dt / n * 1000:.1f} ms/step)")


if __name__ == "__main__":
    main()
