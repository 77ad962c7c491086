"""Pretrained backbone initialization on the training path.

The reference initializes backbones from ImageNet checkpoints when
``config['graph']['pretrained']`` is set: HRNet from
``hrnetv2_w{N}_imagenet_pretrained.pth`` (ref ``models/HRNet.py:657-684``),
Swin from ``pytorch_checkpoints/swin_imagenet/{name}_patch4_window7_224.pth``
with relative-position-bias interpolation (``models/Swin.py:674-716``), and
torchvision-pretrained ResNets (``models/DeepLabv3.py:26-33``,
``models/OCR.py:50,79``).  The paper's accuracy is unreachable without them.

This module resolves a checkpoint path from the config, converts the torch
state_dict with :mod:`mscs_tpu.utils.torch_convert`, and grafts it into the
model's variable tree under the ``backbone`` scope.  ``channel_pad``-ded
HRNets get zero-filled extra channels (function-preserving, see
``torch_convert.pad_variables``).
"""
from __future__ import annotations

import glob
import os
from typing import Any

import jax
import numpy as np

from mscs_tpu.utils.logger import printlog

# our variant key -> official checkpoint filename stem (ref Swin.py:36-91)
SWIN_CHECKPOINT_NAMES = {
    "swinT": "swin_tiny",
    "swinS": "swin_small",
    "swinB": "swin_base",
    "swinL": "swin_large",
}


def _candidate_paths(backbone: str, data_path: str | None) -> list[str]:
    roots = [p for p in (data_path, ".") if p]
    cands: list[str] = []
    if backbone.startswith("hrnet"):
        fname = f"hrnetv2_w{backbone[len('hrnet'):]}_imagenet_pretrained.pth"
        for r in roots:
            cands += [os.path.join(r, "pytorch_checkpoints", "hrnet", fname),
                      os.path.join(r, fname)]
    elif backbone.startswith("swin"):
        fname = (f"{SWIN_CHECKPOINT_NAMES[backbone]}"
                 "_patch4_window7_224.pth")
        for r in roots:
            cands.append(os.path.join(r, "pytorch_checkpoints",
                                      "swin_imagenet", fname))
    elif backbone.startswith("resnet"):
        for r in roots:
            cands.append(os.path.join(r, "pytorch_checkpoints",
                                      f"{backbone}_imagenet.pth"))
        # torchvision hub cache (how the reference's pretrained=True loads)
        hub = os.path.expanduser("~/.cache/torch/hub/checkpoints")
        cands += sorted(glob.glob(os.path.join(hub, f"{backbone}-*.pth")))
    return cands


def resolve_checkpoint_path(graph_cfg: dict, data_path: str | None) -> str | None:
    """Find the .pth for this config, or None. Honors ``pretrained`` as a
    path string, ``pretrained_path``, then the reference's default spots."""
    pre = graph_cfg.get("pretrained", False)
    if not pre:
        return None
    if isinstance(pre, str):
        return pre if os.path.isfile(pre) else None
    explicit = graph_cfg.get("pretrained_path")
    if explicit:
        return explicit if os.path.isfile(explicit) else None
    backbone = graph_cfg.get("backbone", "resnet50")
    for cand in _candidate_paths(backbone, data_path):
        if os.path.isfile(cand):
            return cand
    return None


def _load_state_dict(path: str) -> dict:
    import torch
    from mscs_tpu.utils.torch_convert import strip_module_prefix

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("model", "state_dict", "model_state_dict"):
            if key in ckpt and isinstance(ckpt[key], dict):
                ckpt = ckpt[key]
                break
    return strip_module_prefix(ckpt)


def convert_backbone_state_dict(sd: dict, backbone: str) -> dict:
    from mscs_tpu.utils import torch_convert as tc

    if backbone.startswith("hrnet"):
        return tc.convert_hrnet(sd, backbone)
    if backbone.startswith("swin"):
        return tc.convert_swin(sd, backbone)
    if backbone.startswith("resnet"):
        return tc.convert_resnet(sd, backbone)
    raise ValueError(f"no converter for backbone '{backbone}'")


def _shapes(tree) -> Any:
    return jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), tree)


def _resize_swin_bias_tables(converted: dict, template_params: dict) -> None:
    """Bicubic-resize relative-position-bias tables whose window size differs
    from the model's (ref Swin.py:698-716)."""
    from mscs_tpu.utils.torch_convert import _resize_bias_table

    for blk_name, blk in converted["params"].items():
        tmpl_blk = template_params.get(blk_name)
        if not (isinstance(blk, dict) and "attn" in blk and tmpl_blk):
            continue
        key = "relative_position_bias_table"
        got = blk["attn"].get(key)
        want = tmpl_blk.get("attn", {}).get(key)
        if got is not None and want is not None and \
                np.shape(got)[0] != np.shape(want)[0]:
            blk["attn"][key] = _resize_bias_table(np.asarray(got),
                                                  int(np.shape(want)[0]))


def load_pretrained_backbone(variables: dict, graph_cfg: dict,
                             data_path: str | None = None,
                             required: bool = True) -> dict:
    """Return ``variables`` with the ``backbone`` scope replaced by converted
    pretrained weights.  No-op when ``graph.pretrained`` is falsy.

    ``required=False`` downgrades a missing checkpoint file to a warning
    (used for synthetic/debug runs where no checkpoints exist on disk).
    """
    if not graph_cfg.get("pretrained", False):
        return variables
    backbone = graph_cfg.get("backbone", "resnet50")
    path = resolve_checkpoint_path(graph_cfg, data_path)
    if path is None:
        msg = (f"graph.pretrained set but no ImageNet checkpoint found for "
               f"'{backbone}' (searched pretrained/pretrained_path config "
               f"keys and default locations under data_path/cwd)")
        if required:
            raise FileNotFoundError(msg)
        printlog(f"WARNING: {msg} — continuing with random init")
        return variables

    sd = _load_state_dict(path)
    converted = convert_backbone_state_dict(sd, backbone)

    tmpl_p = variables["params"]["backbone"]
    if backbone.startswith("swin"):
        _resize_swin_bias_tables(converted, tmpl_p)
        # ape=True models have an absolute_pos_embed the official
        # checkpoints (trained with ape=False) lack; the reference loads
        # strict=False and keeps it randomly initialised (Swin.py:674-716)
        if ("absolute_pos_embed" in tmpl_p
                and "absolute_pos_embed" not in converted["params"]):
            converted["params"]["absolute_pos_embed"] = (
                tmpl_p["absolute_pos_embed"])
            printlog("WARNING: checkpoint has no absolute_pos_embed "
                     "(ape=True model) — keeping random init, like the "
                     "reference's strict=False load")

    got, want = _shapes(converted["params"]), _shapes(tmpl_p)
    if got != want:
        if graph_cfg.get("channel_pad", 0) and backbone.startswith("hrnet"):
            from mscs_tpu.utils.torch_convert import pad_variables
            converted = {
                "params": pad_variables(converted["params"], tmpl_p),
                "batch_stats": pad_variables(
                    converted["batch_stats"],
                    variables["batch_stats"]["backbone"]),
            }
        else:
            import difflib
            diff = "\n".join(difflib.unified_diff(
                str(want).split(","), str(got).split(","), lineterm=""))[:2000]
            raise ValueError(
                f"converted '{backbone}' checkpoint does not match the model "
                f"tree (strict load):\n{diff}")

    out = {k: dict(v) for k, v in variables.items()}
    out["params"]["backbone"] = converted["params"]
    if converted.get("batch_stats"):
        out["batch_stats"]["backbone"] = converted["batch_stats"]
    printlog(f"loaded pretrained {backbone} backbone from {path}")
    return out
