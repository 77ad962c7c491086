"""Samplers: epoch shuffling + LVIS-style repeat-factor sampling.

Port of ``utils/repeat_factor_sampling.py:65-187``: per-class repeat factor
rf(c) = max(1, sqrt(t / f(c))) from class pixel frequencies, per-image factor
= max over its classes, stochastically rounded each epoch; plus the plain
seeded shuffle that replaces torch's DistributedSampler (device sharding is
handled by the mesh, so the sampler only needs global order + per-host
slicing).
"""
from __future__ import annotations

import numpy as np


def shuffled_indices(n: int, epoch: int, seed: int = 0,
                     shuffle: bool = True) -> np.ndarray:
    if not shuffle:
        return np.arange(n)
    rng = np.random.default_rng(seed * 1000003 + epoch)
    return rng.permutation(n)


def repeat_factors_from_frequencies(class_freqs: dict[int, float],
                                    image_classes: list[list[int]],
                                    repeat_thresh: float) -> np.ndarray:
    """Per-image repeat factors (>= 1.0)."""
    cls_rf = {c: max(1.0, np.sqrt(repeat_thresh / max(f, 1e-12)))
              for c, f in class_freqs.items()}
    out = np.ones((len(image_classes),), np.float64)
    for i, classes in enumerate(image_classes):
        if classes:
            out[i] = max(cls_rf.get(c, 1.0) for c in classes)
    return out


def repeat_factor_indices(repeat_factors: np.ndarray, epoch: int,
                          seed: int = 0, shuffle: bool = True) -> np.ndarray:
    """Stochastic rounding per epoch (ref :161-187): image i appears
    floor(rf_i) + Bernoulli(frac(rf_i)) times, then shuffled."""
    rng = np.random.default_rng(seed * 1000003 + epoch)
    rands = rng.random(len(repeat_factors))
    reps = np.floor(repeat_factors).astype(np.int64)
    reps += (rands < (repeat_factors - np.floor(repeat_factors))).astype(np.int64)
    idx = np.repeat(np.arange(len(repeat_factors)), reps)
    if shuffle:
        idx = rng.permutation(idx)
    return idx
