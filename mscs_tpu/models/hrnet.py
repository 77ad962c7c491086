"""HRNetV2 backbone + segmentation head in Flax (NHWC).

Architecture parity with reference ``models/HRNet.py`` / ``hrnet_config.py``
(HRNetV2-W18/32/48): Bottleneck stage 1, Basic-block branches, full
cross-resolution fusion (1x1 conv + bilinear up for j>i, chained strided 3x3
for j<i), transition layers, final 4-scale concat at 1/4 resolution, 3x3+1x1
cls head, bilinear logit upsample (align_corners from config), and optional
multi-scale projector over the four branch outputs.

This is a fresh TPU-first implementation: NHWC tensors, static shapes, fusion
resizes through ``ops.resize`` (exact torch bilinear), BN sync implicit in
the sharded jit.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from mscs_tpu.data.datasets_info import num_real_classes
from mscs_tpu.models.layers import BatchNorm, Conv, ConvBN
from mscs_tpu.models.projector import Projector
from mscs_tpu.ops.resize import resize_bilinear

# Stage specifications (HRNet-Image-Classification model family).
# (num_modules, num_branches, num_blocks per branch, channels, block type)
HRNET_STAGE_SPECS: dict[str, dict[str, Any]] = {
    "hrnet18": {
        "stage1": (1, 1, [4], [64], "bottleneck"),
        "stage2": (1, 2, [4, 4], [18, 36], "basic"),
        "stage3": (4, 3, [4, 4, 4], [18, 36, 72], "basic"),
        "stage4": (3, 4, [4, 4, 4, 4], [18, 36, 72, 144], "basic"),
    },
    "hrnet32": {
        "stage1": (1, 1, [4], [64], "bottleneck"),
        "stage2": (1, 2, [4, 4], [32, 64], "basic"),
        "stage3": (4, 3, [4, 4, 4], [32, 64, 128], "basic"),
        "stage4": (3, 4, [4, 4, 4, 4], [32, 64, 128, 256], "basic"),
    },
    "hrnet48": {
        "stage1": (1, 1, [4], [64], "bottleneck"),
        "stage2": (1, 2, [4, 4], [48, 96], "basic"),
        "stage3": (4, 3, [4, 4, 4], [48, 96, 192], "basic"),
        "stage4": (3, 4, [4, 4, 4, 4], [48, 96, 192, 384], "basic"),
    },
}


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        identity = x
        out = ConvBN(self.features, 3, self.stride, relu=True, name="cb1")(x, train)
        out = ConvBN(self.features, 3, 1, name="cb2")(out, train)
        if self.downsample:
            identity = ConvBN(self.features, 1, self.stride, padding=0,
                              name="down")(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int          # bottleneck width; output = 4 * features
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        identity = x
        out = ConvBN(self.features, 1, 1, padding=0, relu=True, name="cb1")(x, train)
        out = ConvBN(self.features, 3, self.stride, relu=True, name="cb2")(out, train)
        out = ConvBN(self.features * self.expansion, 1, 1, padding=0,
                     name="cb3")(out, train)
        if self.downsample:
            identity = ConvBN(self.features * self.expansion, 1, self.stride,
                              padding=0, name="down")(x, train)
        return nn.relu(out + identity)


class HRModule(nn.Module):
    """Parallel branches + full cross-resolution fuse (ref HighResolutionModule)."""
    num_branches: int
    num_blocks: tuple
    channels: tuple
    align_corners: bool = False

    @nn.compact
    def __call__(self, xs: list[jnp.ndarray], train: bool) -> list[jnp.ndarray]:
        # branches
        ys = []
        for i in range(self.num_branches):
            y = xs[i]
            for b in range(self.num_blocks[i]):
                y = BasicBlock(self.channels[i], name=f"branch{i}_block{b}")(y, train)
            ys.append(y)
        if self.num_branches == 1:
            return ys
        # fuse: out[i] = relu(sum_j path(ys[j] -> resolution/channels of i))
        outs = []
        for i in range(self.num_branches):
            acc = None
            for j in range(self.num_branches):
                if j == i:
                    v = ys[j]
                elif j > i:
                    v = ConvBN(self.channels[i], 1, 1, padding=0,
                               name=f"fuse{i}_{j}")(ys[j], train)
                    v = resize_bilinear(v, ys[i].shape[1:3],
                                        align_corners=self.align_corners)
                else:  # j < i: chain of (i-j) strided 3x3s
                    v = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        v = ConvBN(self.channels[i] if last else self.channels[j],
                                   3, 2, relu=not last,
                                   name=f"fuse{i}_{j}_{k}")(v, train)
                acc = v if acc is None else acc + v
            outs.append(nn.relu(acc))
        return outs


class HighResolutionNet(nn.Module):
    """HRNetV2 backbone. Returns (concat_1/4, [s4, s8, s16, s32]).

    ``channel_pad``: round branch widths up to this multiple (e.g. 64). TPU
    lane-occupancy optimization — zero-initialised padded channels stay
    exactly zero through training (zero weights in, zero gradients back), so
    the math is identical to the unpadded network while the 48/96-channel
    convs run 2-3.5x faster on the MXU (see PERF.md).
    """
    variant: str = "hrnet48"
    align_corners: bool = False
    channel_pad: int = 0

    def _ch(self, c: int) -> int:
        if self.channel_pad <= 0:
            return c
        p = self.channel_pad
        return (c + p - 1) // p * p

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        raw_spec = HRNET_STAGE_SPECS[self.variant]
        spec = {
            k: (v[0], v[1], v[2], [self._ch(c) for c in v[3]], v[4])
            for k, v in raw_spec.items()
        }
        # stem: two stride-2 3x3s -> 1/4
        x = ConvBN(64, 3, 2, relu=True, name="stem1")(x, train)
        x = ConvBN(64, 3, 2, relu=True, name="stem2")(x, train)
        # stage 1: 4 bottlenecks 64->256
        _, _, nblk, nch, _ = spec["stage1"]
        y = Bottleneck(nch[0], downsample=True, name="layer1_0")(x, train)
        for b in range(1, nblk[0]):
            y = Bottleneck(nch[0], name=f"layer1_{b}")(y, train)
        prev_channels = [nch[0] * 4]
        xs = [y]

        for stage_idx, stage_key in enumerate(["stage2", "stage3", "stage4"], start=2):
            n_mod, n_br, nblk, nch, _ = spec[stage_key]
            # transition: adapt channel counts / add a new lower branch
            new_xs = []
            for i in range(n_br):
                if i < len(prev_channels):
                    if prev_channels[i] != nch[i]:
                        new_xs.append(ConvBN(nch[i], 3, 1, relu=True,
                                             name=f"transition{stage_idx-1}_{i}")(xs[i], train))
                    else:
                        new_xs.append(xs[i])
                else:
                    # chain of strided convs from the lowest existing branch
                    v = xs[-1]
                    for j in range(i + 1 - len(prev_channels)):
                        out_ch = nch[i] if j == i - len(prev_channels) else prev_channels[-1]
                        v = ConvBN(out_ch, 3, 2, relu=True,
                                   name=f"transition{stage_idx-1}_{i}_{j}")(v, train)
                    new_xs.append(v)
            xs = new_xs
            for m in range(n_mod):
                # Reference quirk: _make_stage never forwards align_corners to
                # HighResolutionModule (ref models/HRNet.py:486-494), so fuse
                # upsamples ALWAYS use align_corners=False even when the final
                # concat upsample (below) honors the config.  Preserved for
                # ImageNet-weight activation parity (test_pretrained).
                xs = HRModule(n_br, tuple(nblk), tuple(nch),
                              align_corners=False,
                              name=f"{stage_key}_module{m}")(xs, train)
            prev_channels = list(nch)

        hi_hw = xs[0].shape[1:3]
        ups = [xs[0]] + [
            resize_bilinear(xi, hi_hw, align_corners=self.align_corners)
            for xi in xs[1:]
        ]
        concat = jnp.concatenate(ups, axis=-1)
        return concat, xs


class HRNet(nn.Module):
    """HRNet segmentation model (ref ``models/HRNet.py:562-654``).

    Returns logits upsampled to input resolution; with a (ms-)projector
    configured, returns (logits, proj_features).
    """
    config: dict
    experiment: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_features: bool = False):
        """``return_features=True`` returns ``(logits, stage4_branches)``
        (strides 4/8/16/32) instead of projector features — the reference's
        ``self.model.return_features = True`` t-SNE path
        (ref ``models/HRNet.py:614-616``, ``managers/BaseManager.py:713-717``)."""
        cfg = self.config
        dataset = cfg["dataset"]
        align_corners = cfg.get("align_corners", True)
        num_classes = num_real_classes(dataset, self.experiment)
        variant = cfg.get("backbone", "hrnet48")
        in_hw = x.shape[1:3]

        concat, scales = HighResolutionNet(
            variant, align_corners,
            channel_pad=cfg.get("channel_pad", 0), name="backbone")(x, train)

        # cls head: 3x3 conv (bias) + BN + 1x1 conv (no bias)
        h = Conv(concat.shape[-1], 3, 1, name="cls_conv1")(concat)
        h = BatchNorm(name="cls_bn")(h, train)
        logits = Conv(num_classes, 1, 1, padding=0, use_bias=False,
                      name="cls_conv2")(h)
        logits = resize_bilinear(logits, in_hw, align_corners=align_corners)

        if return_features:
            return logits, scales
        if "ms_projector" in cfg:
            n_scales = cfg["ms_projector"].get("scales", 4)
            proj = Projector.from_config(
                {**cfg["ms_projector"],
                 "c_in": [s.shape[-1] for s in scales[:n_scales]]},
                name="ms_projector")
            return logits, proj(scales[:n_scales], train)
        if "projector" in cfg:
            proj = Projector.from_config(
                {**cfg["projector"], "c_in": concat.shape[-1]},
                name="projector")
            return logits, proj(concat, train)
        return logits
