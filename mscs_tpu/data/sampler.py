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


def cadis_repeat_factors(df, experiment: int, repeat_thresh: float) -> np.ndarray:
    """Per-image repeat factors for a CaDIS dataframe (ref
    ``utils/repeat_factor_sampling.py:13-63``): class frequency = fraction of
    frames containing the class (summed over canonical classes mapped into
    each experiment class), rf(c) = max(1, sqrt(t/f)), image rf = max over
    present classes."""
    from mscs_tpu.data.datasets_info import DATASETS_INFO
    info = DATASETS_INFO["CADIS"]
    canonical_names = info.CLASS_NAMES[0]
    canon_name_to_id = {v: k for k, v in info.CLASS_INFO[0][1].items()}
    # canonical id -> experiment class id
    canon_to_exp = {}
    for exp_cls, raw_ids in info.CLASS_INFO[experiment][0].items():
        for raw in raw_ids:
            canon_to_exp[raw] = exp_cls
    n = len(df)
    cls_freqs: dict[int, float] = {}
    for name in canonical_names:
        cid = canon_name_to_id[name]
        exp_cls = canon_to_exp.get(cid)
        if exp_cls is None:
            continue
        cls_freqs.setdefault(exp_cls, 0.0)
        if name in df.columns:
            cls_freqs[exp_cls] += float((df[name] > 0).sum()) / n
    cls_rfs = {c: max(1.0, np.sqrt(repeat_thresh / (f if f > 0 else repeat_thresh)))
               for c, f in cls_freqs.items()}
    out = np.ones((n,), np.float64)
    for i, (_, row) in enumerate(df.iterrows()):
        rfs = [cls_rfs[canon_to_exp[canon_name_to_id[name]]]
               for name in canonical_names
               if name in df.columns and row[name] > 0
               and canon_name_to_id[name] in canon_to_exp]
        if rfs:
            out[i] = max(rfs)
    return out
