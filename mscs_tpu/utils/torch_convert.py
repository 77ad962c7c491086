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

from typing import Any

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


# --------------------------------------------------------------------------
# HRNet (HRNet-Image-Classification naming) -> models.hrnet.HighResolutionNet
# --------------------------------------------------------------------------

def convert_hrnet(sd: dict, variant: str = "hrnet48") -> dict:
    """Official hrnetv2_w{18,32,48}_imagenet state_dict -> Flax trees
    (ref loader models/HRNet.py:657-684)."""
    from mscs_tpu.models.hrnet import HRNET_STAGE_SPECS
    sd = strip_module_prefix(sd)
    spec = HRNET_STAGE_SPECS[variant]
    p: dict = {}
    bs: dict = {}

    def cbn(conv_key, bn_key, name):
        node_p = {"conv": {"conv": {}}, "norm": {"bn": {}}}
        node_b = {"norm": {"bn": {}}}
        convert_conv(sd, conv_key, node_p["conv"]["conv"])
        convert_bn(sd, bn_key, node_p["norm"]["bn"], node_b["norm"]["bn"])
        p[name] = node_p
        bs[name] = node_b

    def block(base, name, n_convs, has_down):
        node_p: dict = {}
        node_b: dict = {}
        for ci in range(n_convs):
            sp = {"conv": {"conv": {}}, "norm": {"bn": {}}}
            sb = {"norm": {"bn": {}}}
            convert_conv(sd, f"{base}.conv{ci+1}", sp["conv"]["conv"])
            convert_bn(sd, f"{base}.bn{ci+1}", sp["norm"]["bn"], sb["norm"]["bn"])
            node_p[f"cb{ci+1}"] = sp
            node_b[f"cb{ci+1}"] = sb
        if has_down:
            sp = {"conv": {"conv": {}}, "norm": {"bn": {}}}
            sb = {"norm": {"bn": {}}}
            convert_conv(sd, f"{base}.downsample.0", sp["conv"]["conv"])
            convert_bn(sd, f"{base}.downsample.1", sp["norm"]["bn"], sb["norm"]["bn"])
            node_p["down"] = sp
            node_b["down"] = sb
        p[name] = node_p
        bs[name] = node_b

    cbn("conv1", "bn1", "stem1")
    cbn("conv2", "bn2", "stem2")
    _, _, nblk1, nch1, _ = spec["stage1"]
    for b in range(nblk1[0]):
        block(f"layer1.{b}", f"layer1_{b}", 3, b == 0)  # only block 0 expands

    prev_channels = [nch1[0] * 4]
    for t, stage_key in enumerate(["stage2", "stage3", "stage4"], start=1):
        n_mod, n_br, nblk, nch, _ = spec[stage_key]
        # transitions exist exactly where the model inserts them (spec-driven,
        # like _make_transition_layer): channel change or new branch
        for i in range(n_br):
            if i < len(prev_channels):
                if prev_channels[i] != nch[i]:
                    cbn(f"transition{t}.{i}.0", f"transition{t}.{i}.1",
                        f"transition{t}_{i}")
            else:
                for j in range(i + 1 - len(prev_channels)):
                    cbn(f"transition{t}.{i}.{j}.0", f"transition{t}.{i}.{j}.1",
                        f"transition{t}_{i}_{j}")
        # modules; branch BasicBlocks never have a downsample path
        for m in range(n_mod):
            mod_p: dict = {}
            mod_b: dict = {}
            saved = (p, bs)
            p, bs = mod_p, mod_b
            base = f"{stage_key}.{m}"
            for i in range(n_br):
                for b in range(nblk[i]):
                    block(f"{base}.branches.{i}.{b}", f"branch{i}_block{b}",
                          2, False)
            for i in range(n_br):
                for j in range(n_br):
                    if j > i:
                        cbn(f"{base}.fuse_layers.{i}.{j}.0",
                            f"{base}.fuse_layers.{i}.{j}.1", f"fuse{i}_{j}")
                    elif j < i:
                        for k in range(i - j):
                            cbn(f"{base}.fuse_layers.{i}.{j}.{k}.0",
                                f"{base}.fuse_layers.{i}.{j}.{k}.1",
                                f"fuse{i}_{j}_{k}")
            p, bs = saved
            p[f"{stage_key}_module{m}"] = mod_p
            bs[f"{stage_key}_module{m}"] = mod_b
        prev_channels = list(nch)
    return {"params": p, "batch_stats": bs}


# --------------------------------------------------------------------------
# Swin (official MSRA naming) -> models.swin.SwinTransformer
# --------------------------------------------------------------------------

def _resize_bias_table(table: np.ndarray, new_len: int) -> np.ndarray:
    """Bicubic relative-position-bias interpolation on window-size mismatch
    (ref models/Swin.py:698-716)."""
    old = int(np.sqrt(table.shape[0]))
    new = int(np.sqrt(new_len))
    if old == new:
        return table
    import cv2
    t = table.reshape(old, old, -1)
    t = cv2.resize(t, (new, new), interpolation=cv2.INTER_CUBIC)
    return t.reshape(new * new, -1)


def convert_swin(sd: dict, variant: str = "swinT") -> dict:
    """Official swin_*_patch4_window7_224 state_dict -> Flax params tree."""
    from mscs_tpu.models.swin import SWIN_VARIANTS
    sd = strip_module_prefix(sd)
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    spec = SWIN_VARIANTS[variant]
    depths = spec["depths"]
    p: dict = {}

    p["patch_embed"] = {}
    convert_conv(sd, "patch_embed.proj", p["patch_embed"])
    if "patch_embed.norm.weight" in sd:
        p["patch_norm"] = {}
        convert_ln(sd, "patch_embed.norm", p["patch_norm"])

    for s, depth in enumerate(depths):
        for d in range(depth):
            base = f"layers.{s}.blocks.{d}"
            blk: dict = {"norm1": {}, "norm2": {},
                         "attn": {"qkv": {}, "proj": {}},
                         "mlp_fc1": {}, "mlp_fc2": {}}
            convert_ln(sd, f"{base}.norm1", blk["norm1"])
            convert_ln(sd, f"{base}.norm2", blk["norm2"])
            convert_dense(sd, f"{base}.attn.qkv", blk["attn"]["qkv"])
            convert_dense(sd, f"{base}.attn.proj", blk["attn"]["proj"])
            convert_dense(sd, f"{base}.mlp.fc1", blk["mlp_fc1"])
            convert_dense(sd, f"{base}.mlp.fc2", blk["mlp_fc2"])
            table = _as_np(sd[f"{base}.attn.relative_position_bias_table"])
            blk["attn"]["relative_position_bias_table"] = table
            p[f"stage{s}_block{d}"] = blk
        if s < len(depths) - 1 and f"layers.{s}.downsample.reduction.weight" in sd:
            m: dict = {"norm": {}, "reduction": {}}
            convert_ln(sd, f"layers.{s}.downsample.norm", m["norm"])
            convert_dense(sd, f"layers.{s}.downsample.reduction",
                          m["reduction"])
            p[f"merge{s}"] = m
    for s in range(len(depths)):
        if f"norm{s}.weight" in sd:
            p[f"norm{s}"] = {}
            convert_ln(sd, f"norm{s}", p[f"norm{s}"])
    return {"params": p}


def convert_projector_stack(sd: dict, prefix: str, mlp: list,
                            use_bn: bool) -> tuple[dict, dict]:
    """One torch ``Projector.project{i}`` Sequential -> our ``_ProjectorStack``
    trees.  Torch indices per mlp layer: conv, ReLU[, BN]; final 1x1 conv last
    (ref models/Projector.py:49-72)."""
    p: dict[str, Any] = {}
    bs: dict[str, Any] = {}
    idx = 0
    for layer_id in range(len(mlp)):
        node = {"conv": {}}
        convert_conv(sd, f"{prefix}.{idx}", node["conv"])
        p[f"conv{layer_id}"] = node
        idx += 2  # conv + relu
        if use_bn:
            bn_p: dict[str, Any] = {"bn": {}}
            bn_b: dict[str, Any] = {"bn": {}}
            convert_bn(sd, f"{prefix}.{idx}", bn_p["bn"], bn_b["bn"])
            p[f"bn{layer_id}"] = bn_p
            bs[f"bn{layer_id}"] = bn_b
            idx += 1
    lin = {"conv": {}}
    convert_conv(sd, f"{prefix}.{idx}", lin["conv"])
    p["linear"] = lin
    return p, bs


def convert_hrnet_seg(sd: dict, graph_cfg: dict,
                      variant: str = "hrnet48") -> dict:
    """Full reference seg-HRNet (``models/HRNet.py:562-654``) state_dict ->
    our ``HRNet`` variables: backbone + cls head + (ms_)projector.  Used by
    the parity harness to start both frameworks from identical weights."""
    sd = strip_module_prefix(sd)
    bb_sd = {k[len("backbone."):]: v for k, v in sd.items()
             if k.startswith("backbone.")}
    bb = convert_hrnet(bb_sd, variant)
    p: dict[str, Any] = {"backbone": bb["params"]}
    bs: dict[str, Any] = {"backbone": bb["batch_stats"]}

    # cls_head: Sequential(conv3x3 bias, BN, conv1x1 no-bias)
    p["cls_conv1"] = {"conv": {}}
    convert_conv(sd, "cls_head.0", p["cls_conv1"]["conv"])
    p["cls_bn"] = {"bn": {}}
    bs["cls_bn"] = {"bn": {}}
    convert_bn(sd, "cls_head.1", p["cls_bn"]["bn"], bs["cls_bn"]["bn"])
    p["cls_conv2"] = {"conv": {}}
    convert_conv(sd, "cls_head.2", p["cls_conv2"]["conv"])

    _convert_projectors(sd, graph_cfg, p, bs)
    return {"params": p, "batch_stats": bs}


def _convert_projectors(sd: dict, graph_cfg: dict, p: dict, bs: dict) -> None:
    """Graft torch ``projector_model.*`` stacks into `p`/`bs` (shared by the
    per-model seg converters)."""
    for key, scope in (("ms_projector", "ms_projector"),
                       ("projector", "projector")):
        if key not in graph_cfg:
            continue
        pcfg = graph_cfg[key]
        mlp, use_bn = pcfg.get("mlp", []), pcfg.get("use_bn", False)
        if key == "ms_projector":
            scales = pcfg.get("scales", 4)
            node_p, node_b = {}, {}
            for i in range(scales):
                sp, sb = convert_projector_stack(
                    sd, f"projector_model.project{i}", mlp, use_bn)
                node_p[f"project{i}"] = sp
                if sb:
                    node_b[f"project{i}"] = sb
        else:
            sp, sb = convert_projector_stack(sd, "projector_model.project",
                                             mlp, use_bn)
            node_p = {"project": sp}
            node_b = {"project": sb} if sb else {}
        p[scope] = node_p
        if node_b:
            bs[scope] = node_b


def _convbn_node(sd: dict, conv_prefix: str,
                 bn_prefix: str) -> tuple[dict, dict]:
    """torch (Conv2d, BatchNorm2d) pair -> our ``ConvBN`` params/batch_stats
    subtrees (layers.py: X/conv/conv + X/norm/bn)."""
    p: dict[str, Any] = {"conv": {"conv": {}}, "norm": {"bn": {}}}
    b: dict[str, Any] = {"norm": {"bn": {}}}
    convert_conv(sd, conv_prefix, p["conv"]["conv"])
    convert_bn(sd, bn_prefix, p["norm"]["bn"], b["norm"]["bn"])
    return p, b


def convert_upernet_seg(sd: dict, graph_cfg: dict,
                        variant: str = "swinT") -> dict:
    """Full reference UPerNet seg model (``models/UPerNet.py:110-269``)
    state_dict -> our ``UPerNet`` variables: Swin backbone + PPM/FPN head +
    aux head + (ms_)projector.  Torch naming pinned by the reference's
    constructors: ``fpn.ppm_conv.{i}.{0,1}``, ``fpn.ppm_last_conv.{0,1}``,
    ``fpn.fpn_in.{j}.{0,1}``, ``fpn.fpn_out.{j}.0.{0,1}``,
    ``fpn.conv_last.{0.0,0.1,2}`` (conv3x3 helper is bias-free,
    ref ``utils/torch_utils.py:107-119``), ``aux_head.{0,1,4}``.  Used by the
    upnswin parity harness to start both frameworks from identical weights."""
    sd = strip_module_prefix(sd)
    bb_sd = {k[len("backbone."):]: v for k, v in sd.items()
             if k.startswith("backbone.")}
    assert variant.startswith("swin"), (
        "resnet-backboned UPerNet conversion not wired (no reference "
        "recipe uses it)")
    p: dict[str, Any] = {"backbone": convert_swin(bb_sd, variant)["params"]}
    bs: dict[str, Any] = {}

    fpn_p: dict[str, Any] = {}
    fpn_b: dict[str, Any] = {}
    n_ppm = len({k.split(".")[2] for k in sd
                 if k.startswith("fpn.ppm_conv.")})
    for si in range(n_ppm):
        fpn_p[f"ppm_conv{si}"], fpn_b[f"ppm_conv{si}"] = _convbn_node(
            sd, f"fpn.ppm_conv.{si}.0", f"fpn.ppm_conv.{si}.1")
    fpn_p["ppm_last_conv"], fpn_b["ppm_last_conv"] = _convbn_node(
        sd, "fpn.ppm_last_conv.0", "fpn.ppm_last_conv.1")
    n_lat = len({k.split(".")[2] for k in sd if k.startswith("fpn.fpn_in.")})
    for j in range(n_lat):
        fpn_p[f"fpn_in{j}"], fpn_b[f"fpn_in{j}"] = _convbn_node(
            sd, f"fpn.fpn_in.{j}.0", f"fpn.fpn_in.{j}.1")
        fpn_p[f"fpn_out{j}"], fpn_b[f"fpn_out{j}"] = _convbn_node(
            sd, f"fpn.fpn_out.{j}.0.0", f"fpn.fpn_out.{j}.0.1")
    fpn_p["conv_last_cbr"], fpn_b["conv_last_cbr"] = _convbn_node(
        sd, "fpn.conv_last.0.0", "fpn.conv_last.0.1")
    fpn_p["conv_last_cls"] = {"conv": {}}
    convert_conv(sd, "fpn.conv_last.2", fpn_p["conv_last_cls"]["conv"])
    p["fpn"] = fpn_p
    bs["fpn"] = fpn_b

    if "aux_head.0.weight" in sd:
        p["aux_cbr"], bs["aux_cbr"] = _convbn_node(sd, "aux_head.0",
                                                   "aux_head.1")
        p["aux_cls"] = {"conv": {}}
        convert_conv(sd, "aux_head.4", p["aux_cls"]["conv"])

    _convert_projectors(sd, graph_cfg, p, bs)
    return {"params": p, "batch_stats": bs}


def convert_ocrnet_seg(sd: dict, graph_cfg: dict,
                       variant: str = "hrnet48") -> dict:
    """Full reference OCRNet seg model (``models/OCR.py:95-245``, HRNet
    backbone) state_dict -> our ``OCRNet`` variables.  Torch naming pinned
    by the reference constructors: ``interm_prediction_head.{0,1,4}``
    (conv+bias, BN, cls conv — 2/3 are ReLU/Dropout),
    ``conv_high_map.{0,1}``,
    ``spatial_ocr_head.object_context_block.f_{pixel,object}.{0,1,3,4}``
    (two bias-free conv-BN stacks), ``f_{down,up}.{0,1}``,
    ``spatial_ocr_head.conv_bn_dropout.{0,1}``, ``conv_out`` — used by the
    hrnetocr parity harness to start both frameworks from identical
    weights."""
    sd = strip_module_prefix(sd)
    assert variant.startswith("hrnet"), (
        "resnet-backboned OCRNet conversion not wired (the paper recipe "
        "uses hrnet48)")
    bb_sd = {k[len("backbone."):]: v for k, v in sd.items()
             if k.startswith("backbone.")}
    bb = convert_hrnet(bb_sd, variant)
    p: dict[str, Any] = {"backbone": bb["params"]}
    bs: dict[str, Any] = {"backbone": bb["batch_stats"]}

    p["interm_cbr"], bs["interm_cbr"] = _convbn_node(
        sd, "interm_prediction_head.0", "interm_prediction_head.1")
    p["interm_cls"] = {"conv": {}}
    convert_conv(sd, "interm_prediction_head.4", p["interm_cls"]["conv"])
    p["conv_high_map"], bs["conv_high_map"] = _convbn_node(
        sd, "conv_high_map.0", "conv_high_map.1")

    ocb = "spatial_ocr_head.object_context_block"
    so_p: dict[str, Any] = {"attn": {}}
    so_b: dict[str, Any] = {"attn": {}}
    for name, n_stacks in (("f_pixel", 2), ("f_object", 2),
                           ("f_down", 1), ("f_up", 1)):
        node_p, node_b = {}, {}
        for i in range(n_stacks):
            node_p[f"cbr{i}"], node_b[f"cbr{i}"] = _convbn_node(
                sd, f"{ocb}.{name}.{3 * i}", f"{ocb}.{name}.{3 * i + 1}")
        so_p["attn"][name] = node_p
        so_b["attn"][name] = node_b
    so_p["fuse"], so_b["fuse"] = _convbn_node(
        sd, "spatial_ocr_head.conv_bn_dropout.0",
        "spatial_ocr_head.conv_bn_dropout.1")
    p["spatial_ocr"] = so_p
    bs["spatial_ocr"] = so_b

    p["conv_out"] = {"conv": {}}
    convert_conv(sd, "conv_out", p["conv_out"]["conv"])

    _convert_projectors(sd, graph_cfg, p, bs)
    return {"params": p, "batch_stats": bs}


def pad_variables(src: dict, template: dict) -> dict:
    """Embed an unpadded variable tree into a channel-padded template
    (zero-fill the extra channels).  Lets unpadded ImageNet checkpoints load
    into `channel_pad`ded HRNets; padded channels stay exactly zero through
    training, so the padded model computes the identical function (PERF.md).
    """
    import jax

    def embed(a, t):
        a = np.asarray(a)
        t_shape = np.shape(t)
        if a.shape == tuple(t_shape):
            return a
        out = np.zeros(t_shape, a.dtype)
        out[tuple(slice(0, s) for s in a.shape)] = a
        return out

    return jax.tree_util.tree_map(embed, src, template,
                                  is_leaf=lambda x: not isinstance(x, dict))


def pad_hrnet_variables(src: dict, template: dict, variant: str = "hrnet48",
                        channel_pad: int = 64) -> dict:
    """pad_variables for the HRNet seg model: convs that consume the 4-branch
    CONCAT (cls head / OCR heads) need their input channels scattered to the
    padded branch offsets, not zero-filled contiguously."""
    import jax
    from mscs_tpu.models.hrnet import HRNET_STAGE_SPECS

    out = {c: pad_variables(src[c], template[c]) for c in template}

    widths = HRNET_STAGE_SPECS[variant]["stage4"][3]
    p = channel_pad
    padded = [(w + p - 1) // p * p for w in widths]
    src_off = np.cumsum([0] + widths)[:-1]
    dst_off = np.cumsum([0] + padded)[:-1]

    def scatter_concat_in(kernel_src, kernel_tmpl):
        k = np.zeros(np.shape(kernel_tmpl), np.asarray(kernel_src).dtype)
        ks = np.asarray(kernel_src)
        for w, so, do in zip(widths, src_off, dst_off):
            # input-channel axis is -2 for conv kernels
            k[..., do:do + w, :ks.shape[-1]] = ks[..., so:so + w, :]
        return k

    for name in ("cls_conv1", "conv_high_map", "interm_cbr"):
        if name in out["params"]:
            node = out["params"][name]
            conv = node.get("conv", node)
            if "conv" in conv:
                conv = conv["conv"]
            tmpl_node = template["params"][name]
            tconv = tmpl_node.get("conv", tmpl_node)
            if "conv" in tconv:
                tconv = tconv["conv"]
            sconv = src["params"][name]
            sconv = sconv.get("conv", sconv)
            if "conv" in sconv:
                sconv = sconv["conv"]
            conv["kernel"] = scatter_concat_in(sconv["kernel"],
                                               tconv["kernel"])
    return out
