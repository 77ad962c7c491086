"""Dataset class-metadata registry.

Equivalent surface to the reference's ``utils/datasets_info`` package
(``DATASETS_INFO[name].CLASS_INFO[experiment] = [remap_dict, id->name dict,
categories dict]``, plus ``CLASS_NAMES`` and CaDIS ``DATA_SPLITS`` — see
reference ``utils/datasets_info/CITYSCAPES.py:166-174`` and ``CADIS.py:250-357``).

The factual tables (public dataset label specs) live in
``class_metadata.json``; this module only provides the typed access layer and
derived helpers (remap lookup arrays, ignore-class resolution).
"""
from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

_HERE = os.path.dirname(__file__)


class AttrDict(dict):
    """dict with attribute access, mirroring the reference EasyDict surface."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value


def _intkeys(obj: Any) -> Any:
    """Recursively convert JSON string keys back to int where possible."""
    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            try:
                k = int(k)
            except (TypeError, ValueError):
                pass
            out[k] = _intkeys(v)
        return out
    if isinstance(obj, list):
        return [_intkeys(v) for v in obj]
    return obj


def _load() -> dict[str, AttrDict]:
    with open(os.path.join(_HERE, "class_metadata.json")) as f:
        raw = json.load(f)
    registry: dict[str, AttrDict] = {}
    for name, entry in raw.items():
        registry[name] = AttrDict({k: _intkeys(v) for k, v in entry.items()})
    return registry


DATASETS_INFO: dict[str, AttrDict] = _load()


# ---------------------------------------------------------------------------
# Derived helpers (not in the reference API but used throughout the rebuild)
# ---------------------------------------------------------------------------

def num_all_classes(dataset: str, experiment: int) -> int:
    """len(CLASS_INFO[exp][1]) — includes the 255/ignore entry if present."""
    return len(DATASETS_INFO[dataset].CLASS_INFO[experiment][1])


def has_ignore_class(dataset: str, experiment: int) -> bool:
    return 255 in DATASETS_INFO[dataset].CLASS_INFO[experiment][1]


def ignore_class(dataset: str, experiment: int) -> int:
    """Index the ignore class occupies after `to_network` remapping (255 -> C-1),
    or -1 if the experiment has no ignore class.  Matches reference
    ``losses/DenseContrastiveLossV2.py:18``."""
    if has_ignore_class(dataset, experiment):
        return num_all_classes(dataset, experiment) - 1
    return -1


def num_real_classes(dataset: str, experiment: int) -> int:
    n = num_all_classes(dataset, experiment)
    return n - 1 if has_ignore_class(dataset, experiment) else n


def remap_lookup(dataset: str, experiment: int, max_label: int = 256) -> np.ndarray:
    """Build a flat int32 lookup array implementing CLASS_INFO[exp][0]:
    raw label id -> experiment train id.  Raw ids not mentioned map to 255.

    Mirrors the semantics of reference ``utils/utils.py:104-128`` (remap_mask)
    without the per-call dict walk.
    """
    lut = np.full((max_label,), 255, dtype=np.int32)
    remap = DATASETS_INFO[dataset].CLASS_INFO[experiment][0]
    for train_id, raw_ids in remap.items():
        for raw in raw_ids:
            if 0 <= raw < max_label:
                lut[raw] = train_id
    return lut


def to_network_lookup(dataset: str, experiment: int) -> np.ndarray:
    """Map train ids with 255-ignore into contiguous network ids: 255 -> C-1.

    Mirrors reference ``utils/utils.py`` `to_network` semantics."""
    n_all = num_all_classes(dataset, experiment)
    lut = np.arange(256, dtype=np.int32)
    lut = np.minimum(lut, n_all - 1)
    if has_ignore_class(dataset, experiment):
        lut[255] = n_all - 1
    return lut


def class_names(dataset: str, experiment: int) -> list[str]:
    return DATASETS_INFO[dataset].CLASS_NAMES[experiment]


def categories(dataset: str, experiment: int) -> dict[str, list[int]]:
    return DATASETS_INFO[dataset].CLASS_INFO[experiment][2]
