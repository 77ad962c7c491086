"""channel_pad equivalence: the padded HRNet computes the identical function
when unpadded weights are zero-embedded (the TPU lane-occupancy trick)."""
import pytest

import numpy as np
import jax
import jax.numpy as jnp

from mscs_tpu.models import build_model
from mscs_tpu.utils.torch_convert import pad_hrnet_variables


@pytest.mark.slow
def test_padded_hrnet_matches_unpadded(rng_np):
    cfg = {"model": "HRNet", "dataset": "CITYSCAPES", "backbone": "hrnet18",
           "align_corners": True}
    x = jnp.asarray(rng_np.standard_normal((1, 64, 64, 3)), jnp.float32)

    base = build_model(cfg, 1)
    v0 = base.init(jax.random.key(0), x, train=False)

    padded = build_model({**cfg, "channel_pad": 64}, 1)
    vp_tmpl = padded.init(jax.random.key(1), x, train=False)
    vp = pad_hrnet_variables(v0, vp_tmpl, "hrnet18", 64)

    want = np.asarray(base.apply(v0, x, train=False))
    got = np.asarray(padded.apply(vp, x, train=False))
    # identical math; fp32 summation-order drift accumulates ~1e-3 over the
    # ~30-layer depth (padded zero channels change reduction order)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 5e-3 * max(scale, 1.0)

    # structural invariant: padded backbone channels are EXACTLY zero
    from mscs_tpu.models.hrnet import HighResolutionNet
    bb = HighResolutionNet("hrnet18", True, channel_pad=64)
    vb = {c: vp[c]["backbone"] for c in vp}
    _, scales = bb.apply(vb, x, train=False)
    for real, s in zip((18, 36, 72, 144), scales):
        if s.shape[-1] > real:
            assert np.abs(np.asarray(s)[..., real:]).max() == 0.0

    # training-mode (batch-stats BN) forward also matches its unpadded twin
    want_t, _ = base.apply(v0, x, train=True, mutable=["batch_stats"])
    out_t, _ = padded.apply(vp, x, train=True, mutable=["batch_stats"])
    want_t, out_t = np.asarray(want_t), np.asarray(out_t)
    scale_t = max(np.abs(want_t).max(), 1.0)
    assert np.abs(out_t - want_t).max() < 2e-2 * scale_t
