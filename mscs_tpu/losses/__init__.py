from mscs_tpu.losses.cross_entropy import CITYSCAPES_CE_WEIGHTS, cross_entropy
from mscs_tpu.losses.lovasz import lovasz_softmax
from mscs_tpu.losses.dense_contrastive import (
    DenseContrastiveLossV2,
    DenseContrastiveLossV2_ms,
)
from mscs_tpu.losses.two_scale import TwoScaleLoss
from mscs_tpu.losses.wrapper import LossWrapper

__all__ = [
    "CITYSCAPES_CE_WEIGHTS", "cross_entropy", "lovasz_softmax",
    "DenseContrastiveLossV2", "DenseContrastiveLossV2_ms",
    "TwoScaleLoss", "LossWrapper",
]
