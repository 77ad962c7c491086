from mscs_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
    downsample_labels_nearest,
)
from mscs_tpu.ops.sampling import AnchorSample, anchor_capacity, sample_anchors
from mscs_tpu.ops.infonce import masked_infonce, masked_infonce_cross
from mscs_tpu.ops.metrics import (
    confusion_matrix,
    normalise_confusion_matrix,
    pixel_accuracy,
    iou_per_class,
    mean_iou,
)

__all__ = [
    "resize_bilinear", "resize_nearest", "downsample_labels_nearest",
    "AnchorSample", "anchor_capacity", "sample_anchors",
    "masked_infonce", "masked_infonce_cross",
    "confusion_matrix", "normalise_confusion_matrix", "pixel_accuracy",
    "iou_per_class", "mean_iou",
]
