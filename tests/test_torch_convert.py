"""Weight-conversion parity: hand-built torch modules -> converted Flax
activations must match to fp32 precision.  This validates the geometry
conventions (conv padding, strided sampling positions, BN eval math, maxpool
padding) that silently kill mIoU if wrong."""
import numpy as np
import pytest
import torch
from torch import nn as tnn

import jax
import jax.numpy as jnp

from mscs_tpu.models.resnet import ResNet
from mscs_tpu.utils.torch_convert import convert_resnet


def _torch_resnet50_stump():
    """torchvision-topology resnet50 built from torch.nn primitives (no
    torchvision in this env) with torchvision's state_dict naming."""
    class Bottleneck(tnn.Module):
        def __init__(self, cin, width, stride=1, downsample=False):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(width)
            self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(width)
            self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(width * 4)
            self.relu = tnn.ReLU()
            self.downsample = None
            if downsample:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, width * 4, 1, stride, bias=False),
                    tnn.BatchNorm2d(width * 4))

        def forward(self, x):
            idn = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                idn = self.downsample(x)
            return self.relu(out + idn)

    class Net(tnn.Module):
        def __init__(self, layers=(3, 4, 6, 3)):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            cin = 64
            for li, (w, n) in enumerate(zip((64, 128, 256, 512), layers)):
                blocks = []
                for b in range(n):
                    stride = 2 if (li > 0 and b == 0) else 1
                    ds = b == 0 and (stride != 1 or cin != w * 4)
                    blocks.append(Bottleneck(cin, w, stride, ds))
                    cin = w * 4
                setattr(self, f"layer{li+1}", tnn.Sequential(*blocks))

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            outs = []
            for li in range(4):
                x = getattr(self, f"layer{li+1}")(x)
                outs.append(x)
            return outs

    return Net()


@pytest.mark.parametrize("hw", [(64, 64), (66, 70)])  # even + odd-ish sizes
def test_resnet50_activation_parity(hw, rng_np):
    torch.manual_seed(0)
    tmodel = _torch_resnet50_stump().eval()
    # randomize BN stats so eval-mode normalisation is non-trivial
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    x = rng_np.standard_normal((1, 3, *hw)).astype(np.float32)
    with torch.no_grad():
        t_outs = [o.numpy() for o in tmodel(torch.from_numpy(x))]

    jmodel = ResNet("resnet50", (False, False, False))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = jax.eval_shape(
        lambda: jmodel.init(jax.random.key(0), xj, train=False))
    converted = convert_resnet(tmodel.state_dict(), "resnet50")
    # shape agreement with the initialised tree
    flat_want = jax.tree_util.tree_map(lambda a: a.shape, variables["params"])
    flat_got = jax.tree_util.tree_map(lambda a: a.shape, converted["params"])
    assert flat_want == flat_got
    outs = jmodel.apply({"params": converted["params"],
                         "batch_stats": converted["batch_stats"]},
                        xj, train=False)
    for c_name, want in zip(["C2", "C3", "C4", "C5"], t_outs):
        got = np.asarray(outs[c_name]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dilated_resnet_parity(rng_np):
    """out_stride-8 dilation replacement must match torch's conv arithmetic."""
    torch.manual_seed(1)
    conv_t = tnn.Conv2d(4, 8, 3, 1, padding=2, dilation=2, bias=False)
    x = rng_np.standard_normal((1, 4, 17, 23)).astype(np.float32)
    with torch.no_grad():
        want = conv_t(torch.from_numpy(x)).numpy()

    from mscs_tpu.models.layers import Conv
    m = Conv(8, 3, 1, dilation=2, use_bias=False)
    v = m.init(jax.random.key(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    v = jax.tree_util.tree_map(lambda a: a, v)
    from mscs_tpu.utils.torch_convert import t2j_conv
    v = {"params": {"conv": {"kernel": jnp.asarray(
        t2j_conv(conv_t.weight.detach().numpy()))}}}
    got = np.asarray(m.apply(v, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-5, atol=1e-5)
