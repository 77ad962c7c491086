"""Output-level TTA protocol parity vs the imported upstream wrappers.

VERDICT r2 #1: the eval path is the deterministic half of the mIoU north
star.  This test runs the UPSTREAM TTA wrappers (via
tests/_tta_oracle_runner.py in a ``python -O`` subprocess — the wrappers
hard-assert cuda) and this framework's TTA engine around the SAME tiny
conv model (identical weights, converted OIHW->HWIO) on the SAME images,
and compares the full-protocol accumulated probability maps and argmax
masks per protocol:

- CTS   (TTA_wrapper_CTS.py:80-147): whole-image scale<1 path + clamped
        overlapping sliding grid, flip-averaged pred.exp() accumulation
- Slide (TTAWrapperSlide.py:105-145): fixed (2048s,512s) resize,
        scales x [flip-avg, unflipped] double accumulation
- PC    (TTA_wrapper_PC.py:82-160): long-side 520 resize, whole-image
        pad-to-crop path + UNCLAMPED padded grid, -mean/std pad value
- base  (TTA_wrapper.py:55-78): whole-image multi-scale mean

Max-abs tolerance 1e-3 on accumulated probs (target from VERDICT r2),
plus argmax-mask equality off numerical ties.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mscs_tpu.models.tta import SlidingWindowTTA, TTAWrapper
from mscs_tpu.ops.resize import resize_bilinear

from tests._reference_oracle import requires_reference

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "tests", "_tta_oracle_runner.py")

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tta") / "oracle.npz")
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run([sys.executable, "-O", RUNNER, out], env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return np.load(out)


def _apply_fn(oracle, tag):
    """The tiny torch model re-expressed in JAX from the SAME weights."""
    w1 = jnp.asarray(oracle[f"{tag}.conv1.weight"].transpose(2, 3, 1, 0))
    b1 = jnp.asarray(oracle[f"{tag}.conv1.bias"])
    w2 = jnp.asarray(oracle[f"{tag}.conv2.weight"].transpose(2, 3, 1, 0))
    b2 = jnp.asarray(oracle[f"{tag}.conv2.bias"])
    dn = ("NHWC", "HWIO", "NHWC")

    def apply_fn(x):
        y = jax.lax.conv_general_dilated(
            x, w1, (2, 2), [(1, 1), (1, 1)], dimension_numbers=dn) + b1
        y = jax.nn.relu(y)
        y = jax.lax.conv_general_dilated(
            y, w2, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn) + b2
        return resize_bilinear(y, x.shape[1:3], align_corners=True)

    return apply_fn


def _compare(ours_nhwc, ref_nchw, atol):
    ref = np.asarray(ref_nchw).transpose(0, 2, 3, 1)
    got = np.asarray(ours_nhwc)
    diff = np.abs(got - ref).max()
    assert diff <= atol, f"max-abs prob diff {diff:.2e} > {atol}"
    # argmax parity off numerical ties (top-2 gap below 10*atol)
    ref_arg, got_arg = ref.argmax(-1), got.argmax(-1)
    part = np.partition(ref, -2, axis=-1)
    gap = part[..., -1] - part[..., -2]
    decisive = gap > 10 * atol
    mism = (ref_arg != got_arg) & decisive
    assert not mism.any(), f"{mism.sum()} decisive argmax mismatches"
    return diff


@requires_reference
@pytest.mark.slow
def test_cts_protocol_matches_reference(oracle):
    x = jnp.asarray(oracle["cts.image"].transpose(0, 2, 3, 1))
    tta = SlidingWindowTTA(
        _apply_fn(oracle, "cts"), 19, [0.75, 1.25], flip=True,
        crop_size=(512, 1024), strides=(341, 683), base_size=2048,
        size_mode="long", grid_mode="clamp", flip_mode="avg",
        whole_image="scale_lt_1", align_corners=True)
    _compare(tta(x), oracle["cts.out"], atol=1e-3)


@requires_reference
@pytest.mark.slow
def test_slide_protocol_matches_reference(oracle):
    x = jnp.asarray(oracle["slide.image"].transpose(0, 2, 3, 1))
    tta = SlidingWindowTTA(
        _apply_fn(oracle, "slide"), 150, [0.5], flip=True,
        crop_size=(512, 512), strides=(341, 341),
        size_mode="fixed", fixed_hw=(2048, 512), grid_mode="clamp",
        flip_mode="both", whole_image="never", align_corners=True)
    _compare(tta(x), oracle["slide.out"], atol=1e-3)


@requires_reference
def test_pc_protocol_matches_reference(oracle):
    x = jnp.asarray(oracle["pc.image"].transpose(0, 2, 3, 1))
    tta = SlidingWindowTTA(
        _apply_fn(oracle, "pc"), 59, [0.75], flip=True,
        crop_size=(512, 512), strides=(341, 341), base_size=520,
        size_mode="long", grid_mode="pad", flip_mode="avg",
        whole_image="fits_crop", align_corners=True,
        pad_value=-MEAN / STD)
    _compare(tta(x), oracle["pc.out"], atol=1e-3)


@requires_reference
def test_base_wrapper_matches_reference(oracle):
    x = jnp.asarray(oracle["base.image"].transpose(0, 2, 3, 1))
    tta = TTAWrapper(_apply_fn(oracle, "base"), 11, [0.5], flip=True,
                     align_corners=True)
    _compare(tta(x), oracle["base.out"], atol=1e-4)
