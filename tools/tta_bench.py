"""Full-resolution Cityscapes TTA latency on the local chip(s).

Measures the paper's eval protocol end-to-end: 1024x2048 input, scales
[.75, 1.25, 1.5, 1.75, 2] + 1.0, horizontal flip, 512x1024 sliding windows
with overlap normalisation (ref TTA_wrapper_CTS.py:80-147 — which bounces
every crop through numpy/cv2 on one GPU; here everything is device-side and
the crop batches ride the data mesh when more than one chip is present).

  python tools/tta_bench.py [--images 3] [--hw 1024 2048]

Prints JSON: first-call (compile) seconds + steady-state sec/image.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=3)
    ap.add_argument("--hw", type=int, nargs=2, default=[1024, 2048])
    ap.add_argument("--scales", type=float, nargs="+",
                    default=[0.75, 1.25, 1.5, 1.75, 2.0])
    ap.add_argument("--backbone", default="hrnet48")
    args = ap.parse_args()

    from __graft_entry__ import _setup_compile_cache
    _setup_compile_cache()
    from mscs_tpu.models import build_model
    from mscs_tpu.models.tta import SlidingWindowTTA
    from mscs_tpu.parallel import make_mesh

    graph = {"model": "HRNet", "dataset": "CITYSCAPES",
             "backbone": args.backbone, "align_corners": True}
    model = build_model(graph, experiment=1)
    x0 = jnp.zeros((1, 512, 1024, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), x0, train=False)

    # variables as an argument: closures embed ~260MB of HLO constants and
    # overflow the remote-compile transport
    @jax.jit
    def apply_vars(variables, image):
        out = model.apply(variables, image, train=False)
        return out[0] if isinstance(out, tuple) else out

    apply_fn = lambda image: apply_vars(variables, image)

    mesh = make_mesh()
    tta = SlidingWindowTTA(apply_fn, 19, args.scales,
                           crop_size=(512, 1024), base_size=2048,
                           size_mode="long", align_corners=True,
                           mesh=mesh if jax.device_count() > 1 else None)

    h, w = args.hw
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)

    t0 = time.perf_counter()
    out = tta(img)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(args.images):
        out = tta(img)
    jax.block_until_ready(out)
    per_image = (time.perf_counter() - t0) / args.images

    print(json.dumps({
        "metric": "cityscapes_tta_full_res_sec_per_image",
        "hw": [h, w], "scales": args.scales + [1.0],
        "first_call_s": round(compile_s, 2),
        "sec_per_image": round(per_image, 3),
        "n_devices": jax.device_count(),
    }))


if __name__ == "__main__":
    main()
