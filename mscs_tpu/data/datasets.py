"""Dataset walkers + host loading — reference-equal file layouts.

Capability port of ``datasets/`` (Cityscapes.py, ADE20K.py, PascalC.py,
CaDIS.py + Dataset_from_df.py): each dataset yields (image uint8 HWC RGB,
label int32 HW in *network ids* — raw ids remapped per experiment with the
ignore class mapped to C-1 — and a metadata dict).  Transforms are applied
per record via ``transforms.apply_transforms``.

A ``SyntheticDataset`` provides deterministic random batches for tests and
benchmarking without data on disk.
"""
from __future__ import annotations

import os
import pathlib
from typing import Any

import numpy as np
from PIL import Image

from mscs_tpu.data.datasets_info import (
    DATASETS_INFO,
    num_all_classes,
    remap_lookup,
    to_network_lookup,
)
from mscs_tpu.data.cache import DecodedCache
from mscs_tpu.data.transforms import apply_transforms


try:  # cv2 decodes PNG/JPEG ~2x faster than PIL and releases the GIL
    import cv2
    cv2.setNumThreads(0)  # workers parallelise across records, not within
except ImportError:  # pragma: no cover
    cv2 = None


def load_image(path) -> np.ndarray:
    if cv2 is not None:
        img = cv2.imread(str(path), cv2.IMREAD_COLOR)
        if img is not None:
            return img[..., ::-1]  # BGR -> RGB
    return np.asarray(Image.open(path).convert("RGB"))


def load_label(path) -> np.ndarray:
    # keep the smallest dtype the file provides; remap/crop handle widening
    if cv2 is not None:
        lbl = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
        if lbl is not None and lbl.ndim == 2:
            return lbl
    return np.asarray(Image.open(path))


class SegDataset:
    """Base: list of (img_path, lbl_path) + remap + transforms.

    ``decoded_cache_dir``: serve decoded arrays from a write-through
    ``data.cache.DecodedCache`` (skips PNG/JPEG decode after epoch 1 —
    the dominant host cost on few-core machines; see data/cache.py).
    """

    def __init__(self, dataset: str, experiment: int, transforms_dict,
                 return_filename: bool = False,
                 decoded_cache_dir: str | None = None):
        self.dataset = dataset
        self.experiment = experiment
        self.transforms_dict = transforms_dict
        self.return_filename = return_filename
        self.decoded_cache = (DecodedCache(decoded_cache_dir)
                              if decoded_cache_dir else None)
        self.records: list[tuple[Any, Any]] = []
        lut_exp = remap_lookup(dataset, experiment)
        lut_net = to_network_lookup(dataset, experiment)
        lut = lut_net[np.clip(lut_exp, 0, 255)]
        # uint8 LUT keeps the full-res remapped label 1 byte/px (crops widen
        # to int32 after augmentation)
        self._lut = lut.astype(np.uint8) if lut.max() < 256 else lut

    def __len__(self) -> int:
        return len(self.records)

    def remap(self, lbl: np.ndarray) -> np.ndarray:
        if lbl.dtype == np.uint8:  # cannot exceed the 256-entry LUT
            return self._lut[lbl]
        return self._lut[np.clip(lbl, 0, 255)]

    def _load(self, path, decode_fn) -> np.ndarray:
        if self.decoded_cache is not None:
            return self.decoded_cache.get(path, lambda: decode_fn(path))
        return decode_fn(path)

    def __getitem__(self, index: int):
        img_path, lbl_path = self.records[index]
        img = self._load(img_path, load_image)
        if lbl_path is None:  # test split: dummy labels = remap(ones), the
            # reference's exact dummy-target rule (ref ADE20K.py:103-104)
            lbl = self.remap(np.ones(img.shape[:2], np.int32))
        else:
            lbl = self.remap(self._load(lbl_path, load_label))
        metadata = {"index": index}
        if self.return_filename:
            metadata["filename"] = str(img_path)
        img, lbl, metadata = apply_transforms(img, lbl, self.transforms_dict,
                                              metadata)
        return img, lbl, metadata


class Cityscapes(SegDataset):
    """leftImg8bit/{split}/{city}/*_leftImg8bit.png + gtFine labelIds
    (ref datasets/Cityscapes.py:103-253); split may be ['train','val']."""

    def __init__(self, root, transforms_dict, split="train", mode="fine",
                 experiment: int = 1, **kw):
        super().__init__("CITYSCAPES", experiment, transforms_dict, **kw)
        mode_dir = "gtFine" if mode == "fine" else "gtCoarse"
        splits = split if isinstance(split, list) else [split]
        for s in splits:
            images_dir = os.path.join(root, "leftImg8bit", s)
            targets_dir = os.path.join(root, mode_dir, s)
            for city in sorted(os.listdir(images_dir)):
                img_dir = os.path.join(images_dir, city)
                for fn in sorted(os.listdir(img_dir)):
                    base = fn.split("_leftImg8bit")[0]
                    lbl = os.path.join(targets_dir, city,
                                       f"{base}_{mode_dir}_labelIds.png")
                    self.records.append((os.path.join(img_dir, fn), lbl))


class ADE20K(SegDataset):
    """ADEChallengeData2016/images|annotations/{training,validation}
    (ref datasets/ADE20K.py:17-147)."""

    _SPLIT_DIR = {"train": "training", "val": "validation", "test": "testing"}

    def __init__(self, root, transforms_dict, split="train",
                 experiment: int = 1, **kw):
        super().__init__("ADE20K", experiment, transforms_dict, **kw)
        splits = split if isinstance(split, list) else [split]
        for s in splits:
            sdir = self._SPLIT_DIR.get(s, s)
            images_dir = os.path.join(root, "ADEChallengeData2016", "images", sdir)
            targets_dir = os.path.join(root, "ADEChallengeData2016",
                                       "annotations", sdir)
            for fn in sorted(os.listdir(images_dir)):
                stem = os.path.splitext(fn)[0]
                lbl = os.path.join(targets_dir, stem + ".png")
                self.records.append((os.path.join(images_dir, fn),
                                     lbl if s != "test" else None))


class PascalC(SegDataset):
    """{split}/image/*.jpg + {split}/label/*.png glob-sorted pairs
    (ref datasets/PascalC.py:15-119)."""

    def __init__(self, root, transforms_dict, split="train",
                 experiment: int = 1, **kw):
        super().__init__("PASCALC", experiment, transforms_dict, **kw)
        images_dir = pathlib.Path(root) / split / "image"
        targets_dir = pathlib.Path(root) / split / "label"
        for ip, tp in zip(sorted(images_dir.glob("*.jpg")),
                          sorted(targets_dir.glob("*.png"))):
            assert ip.stem == tp.stem
            self.records.append((ip, tp))


class DatasetFromDF(SegDataset):
    """CaDIS dataframe-backed dataset (ref datasets/Dataset_from_df.py)."""

    def __init__(self, df, data_path, transforms_dict, experiment: int = 1, **kw):
        super().__init__("CADIS", experiment, transforms_dict, **kw)
        root = pathlib.Path(data_path)
        for _, row in df.iterrows():
            self.records.append((root / row["img_path"], root / row["lbl_path"]))


def get_cadis_dataframes(config: dict, csv_path="data/data.csv"):
    """Train/valid dataframes by video-ID splits (ref datasets/CaDIS.py:6-68)."""
    import pandas as pd
    df = pd.read_csv(csv_path)
    # The reference filters valid frames on df['propagated']==0
    # (datasets/CaDIS.py:34) but NEITHER of its shipped tables
    # (data/data.csv, data/data.pkl) carries that column — the upstream
    # path would KeyError.  Default missing columns to 0 so both the full
    # metadata table and df_builder.py's minimal one load.
    for col in ("propagated", "blacklisted"):
        if col not in df.columns:
            df[col] = 0
    splits = DATASETS_INFO["CADIS"].DATA_SPLITS[int(config["data"]["split"])]
    if len(splits) == 3:
        train_videos, valid_videos, test_videos = splits
        if config.get("mode") == "infer":
            valid_videos = test_videos
    else:
        train_videos, valid_videos = splits
    train = df.loc[df["vid_num"].isin(train_videos)].copy()
    valid = df.loc[(df["vid_num"].isin(valid_videos))
                   & (df["propagated"] == 0)].copy()
    if config["data"].get("blacklist"):
        train = train.drop(train[train["blacklisted"] == 1].index)
        valid = valid.drop(valid[valid["blacklisted"] == 1].index)
    return train.reset_index(), valid.reset_index()


class SyntheticDataset(SegDataset):
    """Deterministic random data with the reference record API — for tests,
    benchmarks, and dry runs without datasets on disk."""

    def __init__(self, dataset: str, experiment: int, transforms_dict,
                 length: int = 64, hw=(512, 512), seed: int = 0, **kw):
        super().__init__(dataset, experiment, transforms_dict, **kw)
        self.length = length
        self.hw = tuple(hw)
        self.seed = seed
        self.records = [(None, None)] * length  # len() support

    def __getitem__(self, index: int):
        rng = np.random.default_rng(self.seed * 100003 + index)
        h, w = self.hw
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        n = num_all_classes(self.dataset, self.experiment)
        # blocky labels so classes have contiguous support (anchor sampling)
        blocks = rng.integers(0, n, (h // 32 + 1, w // 32 + 1))
        lbl = np.kron(blocks, np.ones((32, 32), np.int64))[:h, :w].astype(np.int32)
        metadata = {"index": index}
        if self.return_filename:
            metadata["filename"] = f"synthetic_{index:06d}.png"
        img, lbl, metadata = apply_transforms(img, lbl, self.transforms_dict,
                                              metadata)
        return img, lbl, metadata


DATASET_REGISTRY = {
    "CITYSCAPES": Cityscapes,
    "ADE20K": ADE20K,
    "PASCALC": PascalC,
}
