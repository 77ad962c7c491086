"""Model zoo + registry.

The reference resolves model classes by name via ``globals()``
(``managers/BaseManager.py:439``); here the same config surface goes through
an explicit registry.
"""
from mscs_tpu.models.hrnet import HRNet, HighResolutionNet
from mscs_tpu.models.deeplabv3 import ASPP, DeepLabv3
from mscs_tpu.models.ocr import OCRNet
from mscs_tpu.models.upernet import UPerNet
from mscs_tpu.models.swin import SwinTransformer
from mscs_tpu.models.resnet import ResNet
from mscs_tpu.models.projector import Projector
from mscs_tpu.models.attention import SelfAttention

MODEL_REGISTRY = {
    "HRNet": HRNet,
    "DeepLabv3": DeepLabv3,
    "OCRNet": OCRNet,
    "UPerNet": UPerNet,
}


def build_model(graph_config: dict, experiment: int):
    """Instantiate a model from a reference-style ``config['graph']`` dict."""
    name = graph_config["model"]
    if name not in MODEL_REGISTRY:
        raise ValueError(f"unknown model '{name}' (have {list(MODEL_REGISTRY)})")
    return MODEL_REGISTRY[name](config=graph_config, experiment=experiment)


__all__ = [
    "HRNet", "HighResolutionNet", "DeepLabv3", "ASPP", "OCRNet", "UPerNet",
    "SwinTransformer", "ResNet", "Projector", "SelfAttention",
    "MODEL_REGISTRY", "build_model",
]
