"""Benchmark harness: flagship train-step throughput on the local chip(s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: train images/sec/chip for the Cityscapes paper config
(HRNet-W48 + CE + DC-ms-cs, 512x512 crops — reference trains 512x1024 on
4xA100; per-chip normalisation keeps the comparison honest).

Baseline: the reference repo publishes no numbers (BASELINE.md). A
representative torch DDP figure for HRNet-W48 + contrastive loss on A100 is
~8 img/s/GPU at the paper's 512x1024 crop; at this benchmark's 512x512 crop
(half the pixels) that scales to ~16 img/s/GPU. vs_baseline = measured/16
until a measured torch baseline exists.

Measured on v5e (fp32, bs 4): 20.7 img/s/chip; bf16 activations: 23.5.
Profiling notes (round 1): CE-only == full MS-CS throughput — the
contrastive stack is free; HRNet's 48/96-channel branches bound throughput
(MXU lane under-utilisation), so neither matmul precision nor activation
dtype moves it much. Layout work is the round-2 lever.
"""
from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

A100_BASELINE_IMG_PER_SEC_PER_CHIP = 16.0  # at 512x512; see docstring


def main():
    from __graft_entry__ import (FLAGSHIP_GRAPH, FLAGSHIP_LOSS,
                                 _build_train_setup, _setup_compile_cache)

    _setup_compile_cache()  # keyed on libtpu build — never serves stale AOT
    from mscs_tpu.parallel import make_mesh, replicate, shard_batch

    if os.environ.get("MSCS_BENCH_BF16"):
        from mscs_tpu.models.layers import set_compute_dtype
        set_compute_dtype("bfloat16")
    n_chips = len(jax.devices())
    batch = 8 * n_chips  # bs/chip 8: +26% over 4 (PERF.md)
    hw = 512
    state, step, batch_data = _build_train_setup(
        dict(FLAGSHIP_GRAPH), dict(FLAGSHIP_LOSS), batch=batch, hw=hw)
    mesh = make_mesh()
    state = replicate(mesh, state)
    batch_data = shard_batch(mesh, batch_data)
    step = jax.jit(step, donate_argnums=(0,))

    rng = jax.random.key(0)
    # warmup / compile
    state, logs = step(state, batch_data, rng, 0)
    jax.block_until_ready(logs["loss"])

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, logs = step(state, batch_data, rng, 0)
    jax.block_until_ready(logs["loss"])
    dt = time.perf_counter() - t0

    img_per_sec = batch * iters / dt
    per_chip = img_per_sec / n_chips
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip_hrnetw48_mscs_512",
        "value": round(per_chip, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(per_chip / A100_BASELINE_IMG_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
