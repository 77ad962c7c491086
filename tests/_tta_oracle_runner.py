"""Reference-TTA oracle runner — executed as ``python -O`` in a subprocess.

Runs the UPSTREAM TTA wrappers (imported from /root/reference, never
copied) around a tiny torch conv model on synthetic images and dumps the
accumulated probability maps + the model weights to an .npz for
tests/test_tta_oracle.py to compare against this framework's TTA engine.

Why a subprocess: the reference wrappers hard-assert
``image.device.type == 'cuda'`` (TTA_wrapper_CTS.py:31) — ``-O`` strips
asserts, and ``torch.Tensor.cuda`` is monkeypatched to a no-op so the
protocol runs unchanged on CPU.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import torch

from tests._reference_oracle import import_reference_module

torch.Tensor.cuda = lambda self, *a, **k: self  # CPU stand-in
torch.manual_seed(0)


class TinyModel(torch.nn.Module):
    """Stride-2 conv -> relu -> 1x1 conv -> align_corners upsample back:
    the minimal model shape the wrappers assume (internal upsample to input
    resolution, .align_corners / .num_classes attributes)."""

    def __init__(self, c):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 16, 3, stride=2, padding=1)
        self.conv2 = torch.nn.Conv2d(16, c, 1)
        self.align_corners = True
        self.num_classes = c

    def forward(self, x):
        y = torch.relu(self.conv1(x))
        y = self.conv2(y)
        return torch.nn.functional.interpolate(
            y, size=x.shape[-2:], mode="bilinear", align_corners=True)


def _weights(model):
    sd = model.state_dict()
    return {k: sd[k].numpy() for k in
            ["conv1.weight", "conv1.bias", "conv2.weight", "conv2.bias"]}


def main(out_path):
    mods = {n: import_reference_module("models." + n) for n in
            ["TTA_wrapper", "TTA_wrapper_CTS", "TTAWrapperSlide",
             "TTA_wrapper_PC"]}
    rng = np.random.default_rng(0)
    out = {}

    def img(h, w):
        return torch.from_numpy(
            rng.standard_normal((1, 3, h, w)).astype(np.float32))

    with torch.no_grad():
        # --- CTS protocol: whole-image path (0.75) + overlapping slide ---
        m = TinyModel(19).eval()
        for k, v in _weights(m).items():
            out["cts." + k] = v
        x = img(128, 256)
        out["cts.image"] = x.numpy()
        tta = mods["TTA_wrapper_CTS"].TTAWrapperCTS(
            m, [0.75, 1.25], flip=True, strides=(341, 683),
            crop_size=(512, 1024))
        out["cts.out"] = tta(x).numpy()

        # --- Slide protocol (ADE20K): fixed (2048s, 512s) + both-flip ---
        m = TinyModel(150).eval()
        for k, v in _weights(m).items():
            out["slide." + k] = v
        x = img(120, 180)
        out["slide.image"] = x.numpy()
        tta = mods["TTAWrapperSlide"].TTAWrapperSlide(
            m, [0.5], flip=True, strides=(341, 341), crop_size=(512, 512))
        out["slide.out"] = tta(x).numpy()

        # --- PC protocol: whole-image (0.75) + padded unclamped grid ---
        m = TinyModel(59).eval()
        for k, v in _weights(m).items():
            out["pc." + k] = v
        x = img(100, 150)
        out["pc.image"] = x.numpy()
        tta = mods["TTA_wrapper_PC"].TTAWrapperPC(m, [0.75])
        out["pc.out"] = tta(x).numpy()

        # --- base whole-image wrapper ---
        m = TinyModel(11).eval()
        for k, v in _weights(m).items():
            out["base." + k] = v
        x = img(64, 96)
        out["base.image"] = x.numpy()
        tta = mods["TTA_wrapper"].TTAWrapper(m, [0.5], flip=True)
        out["base.out"] = tta(x).numpy()

    np.savez(out_path, **out)
    print("oracle outputs written:", out_path)


if __name__ == "__main__":
    main(sys.argv[1])
