"""bf16-activation convergence evidence vs fp32 (VERDICT round-1 item #5).

Trains the flagship recipe (HRNet-W48 + CE + DC-ms-cs, 512² crops, SGD poly)
twice from the SAME init on the SAME device-resident synthetic batch stream —
once with fp32 activations, once with bf16 activations (params stay fp32
both ways) — and compares the loss trajectories and final train-mIoU.
Device-resident batches keep the single TPU busy (no host loader bottleneck)
so hundreds of steps take ~1 minute.

  python tools/bf16_convergence.py [--steps 300] [--bs 8] [--hw 512]

Writes logs/bf16_convergence.json and prints the summary line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def make_batches(n_distinct: int, bs: int, hw: int, seed: int = 0):
    """A small pool of distinct batches (memorisation task)."""
    rng = np.random.default_rng(seed)
    pool = []
    for _ in range(n_distinct):
        img = rng.standard_normal((bs, hw, hw, 3)).astype(np.float32)
        blocks = rng.integers(0, 19, (bs, hw // 64, hw // 64))
        lbl = np.kron(blocks, np.ones((1, 64, 64), np.int64)).astype(np.int32)
        pool.append({"image": jnp.asarray(img), "label": jnp.asarray(lbl)})
    return pool


def run(compute_dtype: str, steps: int, bs: int, hw: int,
        max_features: int | None = None):
    from __graft_entry__ import (FLAGSHIP_GRAPH, FLAGSHIP_LOSS,
                                 _build_train_setup, _setup_compile_cache)
    from mscs_tpu.models.layers import set_compute_dtype
    from mscs_tpu.ops.metrics import mean_iou

    _setup_compile_cache()
    set_compute_dtype(compute_dtype)
    try:
        loss_cfg = dict(FLAGSHIP_LOSS)
        if max_features:
            loss_cfg["max_features_total"] = max_features
        state, step_fn, _ = _build_train_setup(
            dict(FLAGSHIP_GRAPH), loss_cfg, batch=bs, hw=hw)
        step_fn = jax.jit(step_fn, donate_argnums=(0,))
        pool = make_batches(4, bs, hw)
        rng = jax.random.key(0)
        curve = []
        cm = None
        for i in range(steps):
            batch = pool[i % len(pool)]
            state, logs = step_fn(state, batch, jax.random.fold_in(rng, i), 0)
            if i % 10 == 0 or i == steps - 1:
                curve.append({"step": i,
                              "loss": float(logs["loss"]),
                              "ce": float(logs.get("CrossEntropyLoss",
                                                   logs["loss"]))})
                print(f"{compute_dtype} step {i}: {curve[-1]}", flush=True)
            if i == steps - 1:
                cm = np.asarray(jax.device_get(logs["confusion"]), np.int64)
        final_miou = float(mean_iou(jnp.asarray(cm), "CITYSCAPES", 1)
                           ["mean_iou"])
        return curve, final_miou
    finally:
        set_compute_dtype("float32")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--max-features", type=int, default=None,
                    help="override loss.max_features_total (10000 = paper)")
    ap.add_argument("--out", default="logs/bf16_convergence.json")
    args = ap.parse_args()

    curve32, miou32 = run("float32", args.steps, args.bs, args.hw,
                          args.max_features)
    curve16, miou16 = run("bfloat16", args.steps, args.bs, args.hw,
                          args.max_features)

    l32 = np.array([c["loss"] for c in curve32])
    l16 = np.array([c["loss"] for c in curve16])
    summary = {
        "steps": args.steps, "bs": args.bs, "hw": args.hw,
        "max_features": args.max_features,
        "final_loss_fp32": float(l32[-1]), "final_loss_bf16": float(l16[-1]),
        "final_loss_rel_gap": float(abs(l32[-1] - l16[-1]) / l32[-1]),
        "mean_traj_rel_gap": float(np.mean(np.abs(l32 - l16) / l32)),
        "final_train_miou_fp32": miou32, "final_train_miou_bf16": miou16,
    }
    os.makedirs("logs", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "fp32": curve32, "bf16": curve16},
                  f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
