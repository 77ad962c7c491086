"""OCRNet (Object-Contextual Representations) in Flax NHWC.

Parity with reference ``models/OCR.py``: ResNet (C4/C5 cutoff, dilated) or
HRNet-48 backbone; intermediate soft-region head; SpatialGather
(class-probability-weighted feature pooling -> per-class object vectors);
ObjectAttention (pixel-query / object-key-value scaled-dot attention through
1x1 conv stacks); SpatialOCR concat + 1x1 -> 512; final 1x1 classifier.
Outputs ordered [interm_up_logits, up_logits, (proj_feats)] (ref :218-245).
The attention here is pixels x classes (N x K) — already TPU-friendly
einsums, never an N x N map.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mscs_tpu.data.datasets_info import num_real_classes
from mscs_tpu.models.hrnet import HighResolutionNet
from mscs_tpu.models.layers import Conv, ConvBN
from mscs_tpu.models.projector import Projector
from mscs_tpu.models.resnet import ResNet
from mscs_tpu.ops.resize import resize_bilinear


def spatial_gather(feats: jnp.ndarray, probs: jnp.ndarray,
                   scale: float = 1.0) -> jnp.ndarray:
    """Soft class-region pooling (ref SpatialGatherModule :254-278).

    :param feats: (B, H, W, C); :param probs: (B, H, W, K) region logits
    :returns: (B, K, C) per-class object representation
    """
    b, h, w, c = feats.shape
    k = probs.shape[-1]
    p = nn.softmax(scale * probs.reshape(b, h * w, k), axis=1)  # over pixels
    f = feats.reshape(b, h * w, c)
    return jnp.einsum("bnk,bnc->bkc", p, f, preferred_element_type=jnp.float32
                      ).astype(feats.dtype)


class _KeyStack(nn.Module):
    """1x1 conv-BN-ReLU (x depth) transform used for phi/psi/down/up."""
    features: int
    depth: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        for i in range(self.depth):
            x = ConvBN(self.features, 1, 1, padding=0, relu=True,
                       name=f"cbr{i}")(x, train)
        return x


class ObjectAttention(nn.Module):
    """Pixel-to-object attention (ref ObjectAttentionBlock2D :281-392)."""
    in_channels: int
    key_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, proxy: jnp.ndarray, train: bool) -> jnp.ndarray:
        b, h, w, c = x.shape
        k = proxy.shape[1]
        query = _KeyStack(self.key_channels, 2, name="f_pixel")(x, train)
        key = _KeyStack(self.key_channels, 2, name="f_object")(
            proxy[:, None], train)[:, 0]                     # (B, K, Ck)
        value = _KeyStack(self.key_channels, 1, name="f_down")(
            proxy[:, None], train)[:, 0]                     # (B, K, Ck)
        q = query.reshape(b, h * w, self.key_channels)
        sim = jnp.einsum("bnc,bkc->bnk", q, key,
                         preferred_element_type=jnp.float32)
        sim = nn.softmax(sim * self.key_channels ** -0.5, axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bnk,bkc->bnc", sim, value,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        ctx = ctx.reshape(b, h, w, self.key_channels)
        return _KeyStack(self.in_channels, 1, name="f_up")(ctx, train)


class SpatialOCR(nn.Module):
    """Context aggregation + fuse (ref SpatialOCR_Module :395-429)."""
    in_channels: int = 512
    key_channels: int = 256
    out_channels: int = 512

    @nn.compact
    def __call__(self, feats: jnp.ndarray, proxy: jnp.ndarray, train: bool) -> jnp.ndarray:
        ctx = ObjectAttention(self.in_channels, self.key_channels,
                              name="attn")(feats, proxy, train)
        out = jnp.concatenate([ctx, feats], axis=-1)
        return ConvBN(self.out_channels, 1, 1, padding=0, relu=True,
                      name="fuse")(out, train)


class OCRNet(nn.Module):
    config: dict
    experiment: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        cfg = self.config
        num_classes = num_real_classes(cfg["dataset"], self.experiment)
        backbone_name = cfg.get("backbone", "resnet50")
        align_corners = cfg.get("align_corners", True)
        out_stride = cfg.get("out_stride", 8)
        in_hw = x.shape[1:3]
        is_hrnet = "hrnet" in backbone_name

        if is_hrnet:
            concat, scales = HighResolutionNet(
                backbone_name, align_corners,
                channel_pad=cfg.get("channel_pad", 0), name="backbone")(x, train)
            high_feats = concat
            interm_in = concat
        else:
            striding = {8: (False, True, True), 16: (False, False, True),
                        32: (False, False, False)}[out_stride]
            feats = ResNet(backbone_name, striding, name="backbone")(x, train)
            high_feats = feats["C5"]
            interm_in = feats["C4"]

        # intermediate soft-region logits (aux supervision)
        h = ConvBN(512, 3, 1, relu=True, use_bias=True,
                   name="interm_cbr")(interm_in, train)
        interm_logits = Conv(num_classes, 1, 1, padding=0,
                             name="interm_cls")(h)
        # map high-level features to 512
        x_high = ConvBN(512, 3, 1, relu=True, name="conv_high_map",
                        use_bias=True)(high_feats, train)

        proxy = spatial_gather(x_high, interm_logits)
        ocr = SpatialOCR(512, 256, 512, name="spatial_ocr")(x_high, proxy, train)
        logits = Conv(num_classes, 1, 1, padding=0, name="conv_out")(ocr)

        up = lambda l: resize_bilinear(l, in_hw, align_corners=align_corners)
        outputs = [up(interm_logits), up(logits)]

        if "ms_projector" in cfg:
            if is_hrnet:
                n_scales = 4
                proj_in = scales[:n_scales]
            else:
                proj_in = [feats["C2"], feats["C5"]]
            proj = Projector.from_config(
                {**cfg["ms_projector"], "c_in": [f.shape[-1] for f in proj_in]},
                name="ms_projector")
            outputs.append(proj(proj_in, train))
        elif "projector" in cfg:
            before = cfg["projector"].get("before_context", True)
            src = high_feats if before else ocr
            proj = Projector.from_config(
                {**cfg["projector"], "c_in": src.shape[-1]}, name="projector")
            outputs.append(proj(src, train))
        return outputs
