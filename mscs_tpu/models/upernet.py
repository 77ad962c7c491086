"""UPerNet (PPM + FPN decode head) with ResNet or Swin backbone, Flax NHWC.

Parity with reference ``models/UPerNet.py``: PPM over pool scales [1,2,3,6]
(bilinear up with align_corners=False — the one hardcoded exception,
ref :78), top-down lateral FPN, fuse-concat of all levels -> conv_last ->
classes, optional aux head at a backbone index, projector positions
'backbone' | 'fpn' | 'fused_feats'.  Output ordering matches the reference:
[interm_up_logits?, up_logits, proj_feats?].
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mscs_tpu.data.datasets_info import num_real_classes
from mscs_tpu.models.layers import Conv, ConvBN
from mscs_tpu.models.projector import Projector
from mscs_tpu.models.resnet import ResNet
from mscs_tpu.models.swin import SwinTransformer
from mscs_tpu.ops.pool import adaptive_avg_pool
from mscs_tpu.ops.resize import resize_bilinear


class FPNHead(nn.Module):
    """PPM + FPN decoder (ref FPN, UPerNet.py:14-107)."""
    num_classes: int
    pool_scales: tuple = (1, 2, 3, 6)
    ppm_channels: int = 512
    fpn_channels: int = 512
    align_corners: bool = True

    @nn.compact
    def __call__(self, conv_out: list[jnp.ndarray], train: bool):
        conv5 = conv_out[-1]
        hw = conv5.shape[1:3]
        ppm = [conv5]
        for si, scale in enumerate(self.pool_scales):
            p = adaptive_avg_pool(conv5, scale)
            p = resize_bilinear(p, hw, align_corners=False)  # ref :78
            p = ConvBN(self.ppm_channels, 1, 1, padding=0, relu=True,
                       name=f"ppm_conv{si}")(p, train)
            ppm.append(p)
        # conv3x3 helper is bias-free (ref utils/torch_utils.py:107-119)
        feature = ConvBN(self.fpn_channels, 3, 1, relu=True,
                         name="ppm_last_conv")(jnp.concatenate(ppm, -1), train)

        n_lvl = len(conv_out)
        fpn_features = [feature]
        for i in range(2, n_lvl + 1):  # top-down
            lateral = ConvBN(self.fpn_channels, 1, 1, padding=0, relu=True,
                             name=f"fpn_in{n_lvl - i}")(conv_out[-i], train)
            feature = lateral + resize_bilinear(
                feature, lateral.shape[1:3], align_corners=self.align_corners)
            fpn_features.append(
                ConvBN(self.fpn_channels, 3, 1, relu=True,
                       name=f"fpn_out{n_lvl - i}")(feature, train))
        fpn_features.reverse()  # [P2 .. P5]

        out_hw = fpn_features[0].shape[1:3]
        # reference fusion concat order is [P2, P5, P4, P3] — it appends
        # fpn_feature_list[-i+1] for i=2..n (ref UPerNet.py:96-101), i.e.
        # deepest-first after P2.  Channel order matters for conv_last
        # weight parity with converted checkpoints.
        fusion = [fpn_features[0]] + [
            resize_bilinear(f, out_hw, align_corners=self.align_corners)
            for f in fpn_features[:0:-1]
        ]
        fusion_out = jnp.concatenate(fusion, axis=-1)
        h = ConvBN(self.fpn_channels, 3, 1, relu=True,
                   name="conv_last_cbr")(fusion_out, train)
        logits = Conv(self.num_classes, 1, 1, padding=0, name="conv_last_cls")(h)
        return logits, fpn_features, fusion_out


class UPerNet(nn.Module):
    config: dict
    experiment: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_features: bool = False):
        """``return_features=True`` returns ``(up_logits, backbone_feats)``
        with feats ordered shallow-first [C2..C5] — the reference t-SNE path
        indexes ``features[::-1][s]`` on its deep-first list
        (ref ``managers/BaseManager.py:731-743``)."""
        cfg = self.config
        num_classes = num_real_classes(cfg["dataset"], self.experiment)
        align_corners = cfg.get("align_corners", True)
        backbone_name = cfg["backbone"]
        in_hw = x.shape[1:3]

        if backbone_name.startswith("swin"):
            feats = SwinTransformer(
                backbone_name,
                drop_rate=cfg.get("drop_rate", 0.0),
                attn_drop_rate=cfg.get("attn_drop_rate", 0.0),
                drop_path_rate=cfg.get("drop_path_rate", 0.3),
                ape=cfg.get("ape", False),
                pretrain_img_size=cfg.get("pretrain_img_size", 224),
                frozen_stages=cfg.get("frozen_stages", -1),
                remat=cfg.get("use_checkpoint", False),
                attn_impl=cfg.get("window_attn_impl", "auto"),
                name="backbone")(x, train)
        else:
            d = ResNet(backbone_name, (False, False, False),
                       name="backbone")(x, train)
            feats = [d["C2"], d["C3"], d["C4"], d["C5"]]

        logits, fpn_feats, fused = FPNHead(
            num_classes,
            tuple(cfg.get("pool_scales", (1, 2, 3, 6))),
            cfg.get("ppm_num_ch", 512),
            cfg.get("fpn_num_ch", 512),
            align_corners, name="fpn")(feats, train)
        up_logits = resize_bilinear(logits, in_hw, align_corners=align_corners)

        if return_features:
            return up_logits, feats
        outputs = []
        if "aux_head" in cfg:
            idx = cfg["aux_head"]["in_index"]
            out_ch = cfg["aux_head"].get("out_channels", 256)
            h = ConvBN(out_ch, 3, 1, relu=True, use_bias=True,
                       name="aux_cbr")(feats[idx], train)
            interm = Conv(num_classes, 1, 1, padding=0, name="aux_cls")(h)
            outputs.append(resize_bilinear(interm, in_hw,
                                           align_corners=align_corners))
        outputs.append(up_logits)

        if "ms_projector" in cfg:
            position = cfg["ms_projector"].get("position", "backbone")
            n_scales = cfg["ms_projector"].get("scales", len(feats))
            src = feats if position == "backbone" else fpn_feats
            src = src[:n_scales] if position != "backbone" else src
            proj = Projector.from_config(
                {**cfg["ms_projector"], "c_in": [f.shape[-1] for f in src]},
                name="ms_projector")
            outputs.append(proj(src, train))
        elif "projector" in cfg:
            proj = Projector.from_config(
                {**cfg["projector"], "c_in": fused.shape[-1]}, name="projector")
            outputs.append(proj(fused, train))
        return outputs[0] if len(outputs) == 1 else outputs
