"""Config loading: JSON file + path_info + defaults merge + CLI overrides.

Same public surface as reference ``utils/config_parsers.py:10-80`` +
``main.py:89-149`` (the ``-l ce|ms|ms_cs`` loss presets included), so a user
of the reference can bring their configs across unchanged.
"""
from __future__ import annotations

import copy
import json
import pathlib
from typing import Any

from mscs_tpu.config.defaults import DEFAULT_CONFIG_DICT, DEFAULT_CONFIG_NESTED_DICT

_DATASET_SUFFIX = {"CITYSCAPES": "_CTS", "PASCALC": "_PASCALC",
                   "CADIS": "_CADIS", "ADE20K": "_ADE20K"}


def parse_config(file_path: str, user: str = "c", device=-1,
                 dataset: str | int = -1, parallel: bool = False,
                 require_paths: bool = False) -> dict[str, Any]:
    with open(file_path) as f:
        config_dict = json.load(f)

    if dataset != -1 and dataset is not None:
        assert dataset in _DATASET_SUFFIX
        config_dict["data"]["dataset"] = dataset
    else:
        dataset = config_dict["data"]["dataset"]

    if dataset in ("CITYSCAPES", "PASCALC", "ADE20K"):
        config_dict["data"]["experiment"] = 1
    config_dict["parallel"] = parallel

    # user -> (data_path, log_path) indirection via configs/path_info.json
    path_info_file = pathlib.Path(file_path).parent.parent / "path_info.json"
    if path_info_file.exists():
        with open(path_info_file) as f:
            path_info = json.load(f)
        key = user + _DATASET_SUFFIX.get(dataset, "")
        if key in path_info:
            config_dict["data_path"] = path_info[key][0]
            config_dict["log_path"] = path_info[key][1]
    if require_paths:
        assert pathlib.Path(config_dict["data_path"]).exists()
        assert pathlib.Path(config_dict["log_path"]).exists()
    config_dict.setdefault("data_path", None)
    config_dict.setdefault("log_path", "logs")

    if isinstance(device, list) or (isinstance(device, int) and device >= 0):
        config_dict["gpu_device"] = device

    merged = copy.deepcopy(DEFAULT_CONFIG_DICT)
    merged.update(config_dict)
    for k, v in copy.deepcopy(DEFAULT_CONFIG_NESTED_DICT).items():
        nested = v
        nested.update(config_dict.get(k, {}))
        merged[k] = nested
    merged["data"]["transform_values"]["experiment"] = merged["data"]["experiment"]
    return merged


def apply_loss_preset(config: dict[str, Any], preset: str | None) -> dict[str, Any]:
    """CLI ``-l ce|ms|ms_cs`` presets (ref main.py:97-113)."""
    if not preset:
        return config
    if "ms" in preset:
        config["loss"]["losses"] = {"CrossEntropyLoss": 1,
                                    "DenseContrastiveLossV2_ms": 0.1}
        config["loss"]["cross_scale_contrast"] = False
        proj = {"mlp": [[1, -1, 1]], "scales": 4, "d": 256, "use_bn": True}
        if config["graph"]["model"] == "UPerNet":
            proj["position"] = "backbone"
        config["graph"]["ms_projector"] = proj
    if "cs" in preset:
        config["loss"]["cross_scale_contrast"] = True
    if preset == "ce":
        config["loss"]["losses"] = {"CrossEntropyLoss": 1}
        config["graph"].pop("ms_projector", None)
    return config


def loss_config(config: dict[str, Any]) -> dict[str, Any]:
    """Assemble the flat dict LossWrapper.from_config expects."""
    lc = dict(config["loss"])
    lc["dataset"] = config["data"]["dataset"]
    lc["experiment"] = config["data"]["experiment"]
    lc.setdefault("device", None)
    return lc


def graph_config(config: dict[str, Any]) -> dict[str, Any]:
    gc = dict(config["graph"])
    gc["dataset"] = config["data"]["dataset"]
    return gc
