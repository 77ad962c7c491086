"""Adaptive-pool and ASPP parity vs torch."""
import numpy as np
import pytest
import torch
from torch import nn as tnn

import jax
import jax.numpy as jnp

from mscs_tpu.ops.pool import adaptive_avg_pool


@pytest.mark.parametrize("out", [1, 2, 3, 6])
@pytest.mark.parametrize("hw", [(16, 16), (17, 23)])
def test_adaptive_avg_pool_matches_torch(out, hw, rng_np):
    x = rng_np.standard_normal((2, 5, *hw)).astype(np.float32)
    want = tnn.AdaptiveAvgPool2d(out)(torch.from_numpy(x)).numpy()
    got = adaptive_avg_pool(jnp.asarray(x.transpose(0, 2, 3, 1)), out)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-5, atol=1e-6)


def test_aspp_matches_torch_oracle(rng_np):
    """ASPP branch structure vs a torch oracle built from the DeepLab v3
    formulation (1x1, dilated 3x3 at 12/24/36, global pool, fuse 1x1)."""
    torch.manual_seed(0)
    c_in, c_aspp, mult = 16, 8, 2

    class TorchASPP(tnn.Module):
        def __init__(self):
            super().__init__()
            self.aspp1 = tnn.Conv2d(c_in, c_aspp, 1, bias=False)
            self.aspp2 = tnn.Conv2d(c_in, c_aspp, 3, padding=6 * mult,
                                    dilation=6 * mult, bias=False)
            self.aspp3 = tnn.Conv2d(c_in, c_aspp, 3, padding=12 * mult,
                                    dilation=12 * mult, bias=False)
            self.aspp4 = tnn.Conv2d(c_in, c_aspp, 3, padding=18 * mult,
                                    dilation=18 * mult, bias=False)
            self.aspp5 = tnn.Conv2d(c_in, c_aspp, 1, bias=False)
            self.bns = tnn.ModuleList(
                [tnn.BatchNorm2d(c_aspp, momentum=0.0003) for _ in range(5)])
            self.conv2 = tnn.Conv2d(c_aspp * 5, c_aspp, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(c_aspp, momentum=0.0003)

        def forward(self, x):
            outs = []
            for i, conv in enumerate([self.aspp1, self.aspp2, self.aspp3,
                                      self.aspp4]):
                outs.append(torch.relu(self.bns[i](conv(x))))
            g = x.mean((2, 3), keepdim=True)
            g = torch.relu(self.bns[4](self.aspp5(g)))
            g = tnn.functional.interpolate(g, x.shape[2:], mode="bilinear",
                                           align_corners=True)
            outs.append(g)
            return torch.relu(self.bn2(self.conv2(torch.cat(outs, 1))))

    tm = TorchASPP().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    x = rng_np.standard_normal((1, c_in, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    from mscs_tpu.models.deeplabv3 import ASPP
    from mscs_tpu.utils.torch_convert import convert_bn, convert_conv

    jm = ASPP(c_aspp=c_aspp, mult=mult, align_corners=True)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = jm.init(jax.random.key(0), xj, train=False)
    sd = tm.state_dict()
    p, bs = {}, {}
    for i in range(1, 6):
        p[f"aspp{i}"] = {"conv": {}}
        convert_conv(sd, f"aspp{i}", p[f"aspp{i}"]["conv"])
        p[f"aspp{i}_bn"] = {"bn": {}}
        bs[f"aspp{i}_bn"] = {"bn": {}}
        convert_bn(sd, f"bns.{i-1}", p[f"aspp{i}_bn"]["bn"],
                   bs[f"aspp{i}_bn"]["bn"])
    p["conv2"] = {"conv": {}}
    convert_conv(sd, "conv2", p["conv2"]["conv"])
    p["bn2"] = {"bn": {}}
    bs["bn2"] = {"bn": {}}
    convert_bn(sd, "bn2", p["bn2"]["bn"], bs["bn2"]["bn"])
    got = jm.apply({"params": p, "batch_stats": bs}, xj, train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_point_sample_matches_torch_grid_sample(rng_np):
    import torch.nn.functional as F
    from mscs_tpu.utils.extras import point_sample
    n, h, w, c, p = 2, 9, 13, 4, 17
    feats = rng_np.standard_normal((n, h, w, c)).astype(np.float32)
    pts = rng_np.uniform(0, 1, (n, p, 2)).astype(np.float32)
    for align in (True, False):
        want = F.grid_sample(
            torch.from_numpy(feats.transpose(0, 3, 1, 2)),
            torch.from_numpy(2.0 * pts - 1.0).unsqueeze(2),
            mode="bilinear", align_corners=align).squeeze(-1).numpy()
        got = np.asarray(point_sample(jnp.asarray(feats), jnp.asarray(pts),
                                      align_corners=align))
        np.testing.assert_allclose(got.transpose(0, 2, 1), want,
                                   rtol=1e-4, atol=1e-5)


def test_balanced_concat_dataset():
    from mscs_tpu.utils.extras import BalancedConcatDataset
    a = list(range(10))
    b = list(range(100, 103))
    ds = BalancedConcatDataset(a, b)
    assert len(ds) == 20
    assert ds[0] == 0 and ds[10] == 100 and ds[13] == 100  # b wraps
