"""Full-resolution TTA latency on the local chip(s).

Measures the paper eval protocols end-to-end (ref TTA_wrapper_CTS.py:80-147
/ TTAWrapperSlide.py:28-101 — which bounce every crop through numpy/cv2 on
one GPU; here everything is device-side and the crop batches ride the data
mesh when more than one chip is present).

  python tools/tta_bench.py                          # W48, Cityscapes CTS
  python tools/tta_bench.py --recipe swinl-cts       # UPerNet Swin-L, CTS
  python tools/tta_bench.py --recipe swinl-slide     # UPerNet Swin-L, ADE
                                                     #  Slide (2048,512)

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
    ap.add_argument("--recipe", default="hrnet-cts",
                    choices=["hrnet-cts", "swinl-cts", "swinl-slide"],
                    help="model + protocol (VERDICT r4 #7: Swin-L TTA)")
    args = ap.parse_args()

    from __graft_entry__ import _setup_compile_cache
    _setup_compile_cache()
    from mscs_tpu.models import build_model
    from mscs_tpu.models.tta import SlidingWindowTTA
    from mscs_tpu.parallel import make_mesh

    if args.recipe == "hrnet-cts":
        graph = {"model": "HRNet", "dataset": "CITYSCAPES",
                 "backbone": args.backbone, "align_corners": True}
        num_classes, crop = 19, (512, 1024)
    else:
        # the paper's strongest model (ref Swin.py:21-94 swinL) under the
        # UPerNet head; ADE20K head for slide, Cityscapes head for CTS
        dataset = "ADE20K" if args.recipe == "swinl-slide" else "CITYSCAPES"
        graph = {"model": "UPerNet", "dataset": dataset,
                 "backbone": "swinL", "align_corners": False,
                 "drop_path_rate": 0.0}
        num_classes = 150 if dataset == "ADE20K" else 19
        crop = (512, 512) if args.recipe == "swinl-slide" else (512, 1024)
    model = build_model(graph, experiment=1)
    x0 = jnp.zeros((1, *crop, 3), jnp.float32)
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
    mesh = mesh if jax.device_count() > 1 else None
    if args.recipe == "swinl-slide":
        # ADE20K Slide protocol (ref TTAWrapperSlide.py:28-39: img_scale
        # (2048, 512), per-crop flip accumulation)
        tta = SlidingWindowTTA(apply_fn, num_classes, args.scales,
                               crop_size=crop, strides=(341, 341),
                               base_size=512, size_mode="fixed",
                               fixed_hw=(2048, 512), grid_mode="clamp",
                               flip_mode="both", whole_image="never",
                               align_corners=False, mesh=mesh)
    else:
        tta = SlidingWindowTTA(apply_fn, num_classes, args.scales,
                               crop_size=crop, base_size=2048,
                               size_mode="long",
                               align_corners=graph.get("align_corners",
                                                       True),
                               mesh=mesh)

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
        "metric": f"tta_full_res_sec_per_image_{args.recipe}",
        "hw": [h, w], "scales": args.scales + [1.0],
        "first_call_s": round(compile_s, 2),
        "sec_per_image": round(per_image, 3),
        "n_devices": jax.device_count(),
    }))


if __name__ == "__main__":
    main()
