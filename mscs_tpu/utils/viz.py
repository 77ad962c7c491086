"""Visualisation + submission-output helpers.

Port of the reference colormap/submission utilities
(``utils/utils.py:176-282`` mask_to_colormap / to_comb_image,
``utils/utils.py:521-532`` reverse_mapping for submission ids,
``utils/defaults.py:25-170`` per-dataset colormaps — the colour tables live
as data in ``data/datasets_info/colormaps.json``).
"""
from __future__ import annotations

import json
import os

import numpy as np

from mscs_tpu.data.datasets_info import DATASETS_INFO, num_all_classes
from mscs_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

_HERE = os.path.join(os.path.dirname(__file__), "..", "data", "datasets_info")


def get_colormap(dataset: str) -> np.ndarray:
    with open(os.path.join(_HERE, "colormaps.json")) as f:
        return np.asarray(json.load(f)[dataset], np.uint8)


def reverse_mapping(dataset: str, experiment: int) -> np.ndarray:
    """network id -> raw dataset id for submission PNGs, matching the
    upstream composition exactly (utils.py:521-532 reverse_mapping +
    :104-127 remap_mask): the ignore network id maps to 255 (the 255-keyed
    remap group is skipped, and remap_mask's lookup defaults to the ignore
    label), and a train id merging several raw ids takes the LAST raw id
    (successive remap_array writes).  Oracle-pinned in
    tests/test_fake_trees.py::test_submission_remap_matches_reference."""
    remap = DATASETS_INFO[dataset].CLASS_INFO[experiment][0]
    n = num_all_classes(dataset, experiment)
    lut = np.full((n,), 255, np.int32)
    for train_id, raw_ids in remap.items():
        if train_id == 255:
            continue
        if 0 <= train_id < n and raw_ids:
            lut[train_id] = raw_ids[-1]
    return lut


def mask_to_colormap(mask: np.ndarray, dataset: str,
                     experiment: int) -> np.ndarray:
    """Network-id mask (H, W) -> RGB (H, W, 3) via raw-id colormap."""
    cm = get_colormap(dataset)
    raw = reverse_mapping(dataset, experiment)[
        np.clip(mask, 0, num_all_classes(dataset, experiment) - 1)]
    return cm[np.clip(raw, 0, len(cm) - 1)]


def un_normalise(img: np.ndarray) -> np.ndarray:
    """Invert ImageNet normalisation -> uint8 RGB."""
    x = img * IMAGENET_STD + IMAGENET_MEAN
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


def to_comb_image(img: np.ndarray, lbl: np.ndarray, pred: np.ndarray | None,
                  dataset: str, experiment: int) -> np.ndarray:
    """Side-by-side [image | label | prediction] RGB panel (ref :262-282)."""
    panels = [un_normalise(img), mask_to_colormap(lbl, dataset, experiment)]
    if pred is not None:
        panels.append(mask_to_colormap(pred, dataset, experiment))
    return np.concatenate(panels, axis=1)


def save_submission_png(mask: np.ndarray, path, dataset: str,
                        experiment: int) -> None:
    """Write the raw-id remapped prediction (ref BaseManager.py:677-699)."""
    from PIL import Image
    raw = reverse_mapping(dataset, experiment)[
        np.clip(mask, 0, num_all_classes(dataset, experiment) - 1)]
    Image.fromarray(raw.astype(np.uint8)).save(path)


def confusion_matrix_figure(cm: np.ndarray, dataset: str, experiment: int,
                            out_path=None, normalise: str = "col"):
    """Render the confusion matrix as a heatmap PNG (ref utils.py:285-400,
    logged per validation by LoggingManager :224-231)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mscs_tpu.data.datasets_info import class_names

    cm = np.asarray(cm, np.float64)
    if normalise == "col":
        s = cm.sum(axis=0, keepdims=True)
    else:
        s = cm.sum(axis=1, keepdims=True)
    cmn = cm / np.where(s == 0, 1.0, s)
    names = [n for n in class_names(dataset, experiment)][:cm.shape[0]]
    fig, ax = plt.subplots(figsize=(max(6, len(names) * 0.4),) * 2)
    im = ax.imshow(cmn, cmap="viridis", vmin=0, vmax=1)
    ax.set_xticks(range(len(names)))
    ax.set_yticks(range(len(names)))
    ax.set_xticklabels(names, rotation=90, fontsize=6)
    ax.set_yticklabels(names, fontsize=6)
    ax.set_xlabel("target")
    ax.set_ylabel("predicted")
    fig.colorbar(im, fraction=0.046)
    fig.tight_layout()
    if out_path is not None:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
        return None
    return fig
