"""DeepLabv3 (ResNet-50/101 + ASPP) in Flax NHWC.

Parity with reference ``models/DeepLabv3.py``: out-stride 8/16/32 via
dilated ResNet layers, 5-branch ASPP (1x1, three dilated 3x3 at 6/12/18 x
mult=2, global pool) with BN momentum 0.0003, 1x1 conv_out, bilinear
upsample to input resolution (align_corners=True), and optional
single/multi-scale projector before or after context.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mscs_tpu.data.datasets_info import num_real_classes
from mscs_tpu.models.layers import BatchNorm, Conv
from mscs_tpu.models.projector import Projector
from mscs_tpu.models.resnet import ResNet
from mscs_tpu.ops.resize import resize_bilinear

_LAYER_TO_C = {"layer1": "C2", "layer2": "C3", "layer3": "C4", "layer4": "C5"}
_C_CHANNELS = {"C2": 256, "C3": 512, "C4": 1024, "C5": 2048}


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling (ref DeepLabv3.py:147-194)."""
    c_aspp: int = 256
    mult: int = 2
    align_corners: bool = True
    torch_momentum: float = 0.0003

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        branches = []
        for i, (k, d) in enumerate(
                [(1, 1), (3, 6 * self.mult), (3, 12 * self.mult),
                 (3, 18 * self.mult)], start=1):
            b = Conv(self.c_aspp, k, 1, padding=0 if k == 1 else d,
                     dilation=d, use_bias=False, name=f"aspp{i}")(x)
            b = BatchNorm(self.torch_momentum, name=f"aspp{i}_bn")(b, train)
            branches.append(nn.relu(b))
        # image-level branch: global average pool -> 1x1 -> upsample
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = Conv(self.c_aspp, 1, 1, padding=0, use_bias=False, name="aspp5")(g)
        g = BatchNorm(self.torch_momentum, name="aspp5_bn")(g, train)
        g = nn.relu(g)
        g = resize_bilinear(g, x.shape[1:3], align_corners=self.align_corners)
        branches.append(g)
        out = jnp.concatenate(branches, axis=-1)
        out = Conv(self.c_aspp, 1, 1, padding=0, use_bias=False, name="conv2")(out)
        out = BatchNorm(self.torch_momentum, name="bn2")(out, train)
        return nn.relu(out)


class DeepLabv3(nn.Module):
    config: dict
    experiment: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        cfg = self.config
        num_classes = num_real_classes(cfg["dataset"], self.experiment)
        align_corners = cfg.get("align_corners", True)
        out_stride = cfg.get("out_stride", 16)
        assert out_stride in (8, 16, 32)
        striding = {8: (False, True, True), 16: (False, False, True),
                    32: (False, False, False)}[out_stride]
        in_hw = x.shape[1:3]

        feats = ResNet(cfg.get("backbone", "resnet50"),
                       replace_stride_with_dilation=striding,
                       name="backbone")(x, train)
        aspp = ASPP(cfg.get("aspp", {}).get("channels", 256),
                    align_corners=align_corners, name="aspp")(feats["C5"], train)
        logits = Conv(num_classes, 1, 1, padding=0, name="conv_out")(aspp)
        logits = resize_bilinear(logits, in_hw, align_corners=True)

        if "ms_projector" in cfg:
            layer_names = cfg["ms_projector"].get("feats", ["layer1"])
            c_names = [_LAYER_TO_C[f] for f in layer_names]
            proj = Projector.from_config(
                {**cfg["ms_projector"], "c_in": [_C_CHANNELS[c] for c in c_names]},
                name="ms_projector")
            return logits, proj([feats[c] for c in c_names], train)
        if "projector" in cfg:
            before = cfg["projector"].get("before_context", True)
            c_in = _C_CHANNELS["C5"] if before else aspp.shape[-1]
            proj = Projector.from_config({**cfg["projector"], "c_in": c_in},
                                         name="projector")
            return logits, proj(feats["C5"] if before else aspp, train)
        return logits
