"""Test-time access to the upstream reference implementation as an oracle.

The upstream PyTorch repo (mounted read-only at /root/reference) is imported
— never copied — so parity tests compare against the actual reference
behavior.  Its torchvision/timm imports are satisfied with minimal local
stubs (those libs are absent in this env); only the pieces the imported
model/loss modules touch at module scope are stubbed, plus small functional
implementations (IntermediateLayerGetter, DropPath) needed at call time.

Every public helper returns None / skips when the reference tree is absent,
so the test suite stays green without it.
"""
from __future__ import annotations

import sys
import types

import pytest

REFERENCE_ROOT = "/root/reference"


def _ensure_stub_modules() -> None:
    import torch
    from torch import nn

    if "torchvision" in sys.modules:
        return

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    tfunc = types.ModuleType("torchvision.transforms.functional")
    models = types.ModuleType("torchvision.models")
    mutils = types.ModuleType("torchvision.models._utils")
    datasets = types.ModuleType("torchvision.datasets")

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("torchvision stub: not implemented for tests")

    for name in ["RandomCrop", "ToPILImage", "Compose",
                 "ColorJitter", "Normalize", "RandomApply"]:
        setattr(transforms, name, type(name, (_Unavailable,), {}))

    class ToTensor:
        """Functional mini-implementation of torchvision.ToTensor: PIL/np
        HWC -> torch CHW; uint8 scaled to [0,1], int32 ('I' mode) kept —
        the semantics the reference Resize metadata path relies on
        (utils/transforms.py:176)."""

        def __call__(self, pic):
            import numpy as np
            arr = np.array(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(np.ascontiguousarray(
                arr.transpose(2, 0, 1)))
            return t.float().div(255) if t.dtype == torch.uint8 else t

    transforms.ToTensor = ToTensor
    tfunc.crop = _Unavailable
    transforms.functional = tfunc

    class IntermediateLayerGetter(nn.ModuleDict):
        """Functional mini-implementation of the torchvision helper: run
        children in order, return the requested intermediate outputs."""

        def __init__(self, model, return_layers):
            orig = dict(return_layers)
            layers = {}
            remaining = dict(return_layers)
            for name, module in model.named_children():
                layers[name] = module
                if name in remaining:
                    del remaining[name]
                if not remaining:
                    break
            super().__init__(layers)
            self.return_layers = orig

        def forward(self, x):
            out = {}
            for name, module in self.items():
                x = module(x)
                if name in self.return_layers:
                    out[self.return_layers[name]] = x
            return out

    mutils.IntermediateLayerGetter = IntermediateLayerGetter
    models._utils = mutils
    for name in ["resnet18", "resnet34", "resnet50", "resnet101"]:
        setattr(models, name, _Unavailable)

    tv.transforms = transforms
    tv.models = models
    tv.datasets = datasets
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = tfunc
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models._utils"] = mutils
    sys.modules["torchvision.datasets"] = datasets

    if "tsne_torch" not in sys.modules:
        tsne = types.ModuleType("tsne_torch")
        tsne.TorchTSNE = type("TorchTSNE", (_Unavailable,), {})
        sys.modules["tsne_torch"] = tsne

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tmodels = types.ModuleType("timm.models")
        tlayers = types.ModuleType("timm.models.layers")

        class DropPath(nn.Module):
            """Stochastic depth; identity in eval, matching timm semantics."""

            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = float(drop_prob or 0.0)

            def forward(self, x):
                if self.drop_prob == 0.0 or not self.training:
                    return x
                keep = 1.0 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = torch.bernoulli(torch.full(shape, keep,
                                                  device=x.device)) / keep
                return x * mask

        def to_2tuple(v):
            return tuple(v) if isinstance(v, (tuple, list)) else (v, v)

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a, b)
            return tensor

        tlayers.DropPath = DropPath
        tlayers.to_2tuple = to_2tuple
        tlayers.trunc_normal_ = trunc_normal_
        timm.models = tmodels
        tmodels.layers = tlayers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = tmodels
        sys.modules["timm.models.layers"] = tlayers


def reference_available() -> bool:
    import os
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted")


def import_reference_module(dotted: str):
    """Import e.g. 'models.HRNet' from the reference tree (stubbed deps)."""
    _ensure_stub_modules()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib
    return importlib.import_module(dotted)
