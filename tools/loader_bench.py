"""Host input-pipeline throughput vs the chip's consumption rate.

Generates a fake Cityscapes-layout dataset on disk (PNG images + labelId
masks at full 1024x2048), then measures the threaded DataLoader's end-to-end
rate — PNG decode, remap, the paper's train augmentations (random scale,
512x512 crop w/ class-ratio retries, flip, jitter, normalise) — against the
train step's measured consumption (bench.py: ~43 img/s/chip fp32, ~66 bf16).

  python tools/loader_bench.py [--n 48] [--workers 8] [--batches 30]

Prints one JSON line with images/sec and the verdict vs consumption.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_fake_cityscapes(root: str, n: int, hw=(1024, 2048)) -> None:
    from PIL import Image
    rng = np.random.default_rng(0)
    img_dir = os.path.join(root, "leftImg8bit", "train", "faketown")
    lbl_dir = os.path.join(root, "gtFine", "train", "faketown")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    h, w = hw
    for i in range(n):
        # realistic-entropy image (random noise PNGs decode slower than
        # natural images compress-wise; use smooth gradients + noise mix)
        base = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
        img = (base + rng.normal(0, 30, (h, w, 3))).clip(0, 255).astype(np.uint8)
        # blocky labelIds in the raw Cityscapes id space (0..33)
        blocks = rng.integers(0, 34, (h // 128, w // 128))
        lbl = np.kron(blocks, np.ones((128, 128), np.uint8))
        name = f"faketown_{i:06d}_000019"
        Image.fromarray(img).save(
            os.path.join(img_dir, f"{name}_leftImg8bit.png"))
        Image.fromarray(lbl.astype(np.uint8)).save(
            os.path.join(lbl_dir, f"{name}_gtFine_labelIds.png"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batches", type=int, default=30)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--root", default=None)
    ap.add_argument("--worker-type", default="thread",
                    choices=["thread", "process"])
    ap.add_argument("--backend", default="native",
                    choices=["native", "grain"],
                    help="host loader backend (data.loader_backend)")
    ap.add_argument("--cache", default=None,
                    help="decoded-cache dir (data.cache_decoded); measure "
                         "a warmed cache by running twice with the same dir")
    ap.add_argument("--spawn-cost", type=int, default=0, metavar="E",
                    help="measure per-epoch worker startup instead of "
                         "steady-state rate: time-to-first-batch over E "
                         "epochs (the grain backend spawns its worker pool "
                         "per epoch; the native process pool is persistent "
                         "— VERDICT r3 #8)")
    args = ap.parse_args()

    from mscs_tpu.data import parse_transform_lists
    from mscs_tpu.data.datasets import Cityscapes

    root = args.root or tempfile.mkdtemp(prefix="fake_cts_")
    if not os.path.isdir(os.path.join(root, "leftImg8bit")):
        t0 = time.time()
        make_fake_cityscapes(root, args.n)
        print(f"# generated {args.n} fake 1024x2048 records in "
              f"{time.time()-t0:.1f}s at {root}", file=sys.stderr)

    tf = parse_transform_lists(
        ["flip", "random_scale", "RandomCropImgLbl", "colorjitter",
         "torchvision_normalise"],
        {"crop_shape": [512, 512], "scale_range": [0.5, 2.0],
         "crop_class_max_ratio": 0.75},
        "CITYSCAPES", 1)
    ds = Cityscapes(root, tf, split="train", experiment=1,
                    decoded_cache_dir=args.cache)
    from mscs_tpu.data.grain_loader import build_loader
    loader = build_loader(args.backend, ds, args.bs, shuffle=True,
                          drop_last=True, num_workers=args.workers, seed=0,
                          worker_type=args.worker_type)

    if args.spawn_cost:
        # time-to-first-batch per epoch: epoch 0 includes one-time costs
        # (imports, page cache); epochs 1+ isolate the per-epoch spawn
        ttfb = []
        for epoch in range(args.spawn_cost):
            loader.set_epoch(epoch)
            t0 = time.perf_counter()
            it = iter(loader)
            next(it)
            ttfb.append(round(time.perf_counter() - t0, 3))
            for _ in it:       # drain so workers shut down cleanly
                pass
        loader.close()
        steady = ttfb[1:] or ttfb
        print(json.dumps({
            "metric": "loader_time_to_first_batch_sec",
            "per_epoch": ttfb,
            "steady_mean": round(sum(steady) / len(steady), 3),
            "workers": args.workers,
            "worker_type": args.worker_type,
            "backend": args.backend,
            "host_cores": os.cpu_count(),
        }))
        return

    seen = 0
    t0 = None
    epoch = 0
    while seen < args.batches:
        loader.set_epoch(epoch)
        for batch in loader:
            assert batch["image"].shape[1:] == (512, 512, 3)
            seen += 1
            if seen == 2:
                t0 = time.perf_counter()  # skip warmup batches
            if seen >= args.batches:
                break
        epoch += 1
    dt = time.perf_counter() - t0
    rate = (args.batches - 2) * args.bs / dt
    print(json.dumps({
        "metric": "loader_images_per_sec",
        "value": round(rate, 1),
        "workers": args.workers,
        "worker_type": args.worker_type,
        "backend": args.backend,
        "cache": bool(args.cache),
        "host_cores": os.cpu_count(),
        "crop": [512, 512],
        "chip_consumption_fp32": 43.0,
        "chip_consumption_bf16": 66.0,
        "keeps_up_fp32": rate >= 43.0,
        "keeps_up_bf16": rate >= 66.0,
    }))


if __name__ == "__main__":
    main()
