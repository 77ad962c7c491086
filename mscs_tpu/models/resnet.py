"""ResNet-50/101 backbone (torchvision v1 topology) in Flax NHWC.

Used by DeepLabv3 / OCRNet / UPerNet like the reference uses torchvision's
``resnet50/101`` behind ``IntermediateLayerGetter``
(``models/DeepLabv3.py:59-69``): returns a {'C2','C3','C4','C5'} feature dict
and supports ``replace_stride_with_dilation`` for out-stride 8/16/32.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mscs_tpu.models.layers import ConvBN

RESNET_SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
}


class ResNetBottleneck(nn.Module):
    width: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        identity = x
        out = ConvBN(self.width, 1, 1, padding=0, relu=True, name="cb1")(x, train)
        # torchvision: the first block of a dilated layer keeps the previous
        # dilation on its 3x3 conv; later blocks use the new one.
        out = ConvBN(self.width, 3, self.stride, dilation=self.first_dilation,
                     relu=True, name="cb2")(out, train)
        out = ConvBN(self.width * 4, 1, 1, padding=0, name="cb3")(out, train)
        if self.downsample:
            identity = ConvBN(self.width * 4, 1, self.stride, padding=0,
                              name="down")(x, train)
        return nn.relu(out + identity)


class ResNetBasicBlock(nn.Module):
    width: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        identity = x
        out = ConvBN(self.width, 3, self.stride, dilation=self.first_dilation,
                     relu=True, name="cb1")(x, train)
        out = ConvBN(self.width, 3, 1, dilation=self.dilation, name="cb2")(out, train)
        if self.downsample:
            identity = ConvBN(self.width, 1, self.stride, padding=0,
                              name="down")(x, train)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Returns {'C1': 1/4 stem, 'C2'..'C5': layer1..layer4 outputs}."""
    variant: str = "resnet50"
    replace_stride_with_dilation: tuple = (False, False, False)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> dict[str, jnp.ndarray]:
        block_type, layer_sizes = RESNET_SPECS[self.variant]
        block_cls = ResNetBottleneck if block_type == "bottleneck" else ResNetBasicBlock
        expansion = 4 if block_type == "bottleneck" else 1

        x = ConvBN(64, 7, 2, padding=3, relu=True, name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = {"C1": x}

        widths = (64, 128, 256, 512)
        dilation = 1
        in_ch = 64
        for li, (w, n_blocks) in enumerate(zip(widths, layer_sizes)):
            stride = 1 if li == 0 else 2
            prev_dilation = dilation
            if li > 0 and self.replace_stride_with_dilation[li - 1]:
                dilation *= stride
                stride = 1
            for b in range(n_blocks):
                x = block_cls(
                    w,
                    stride=stride if b == 0 else 1,
                    dilation=dilation,
                    first_dilation=prev_dilation if b == 0 else dilation,
                    downsample=(b == 0 and (stride != 1 or in_ch != w * expansion)),
                    name=f"layer{li+1}_{b}",
                )(x, train)
            in_ch = w * expansion
            feats[f"C{li+2}"] = x
        return feats
