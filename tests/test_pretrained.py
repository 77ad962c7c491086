"""Pretrained-backbone initialization: the full path from a torch ``.pth``
through the converters into the training state, with activation parity
checked against the actual upstream implementation (imported read-only from
/root/reference as the oracle — ref loaders ``models/HRNet.py:657-684``,
``models/Swin.py:674-716``)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from _reference_oracle import import_reference_module, requires_reference
from mscs_tpu.models.hrnet import HighResolutionNet, HRNet
from mscs_tpu.models.swin import SwinTransformer
from mscs_tpu.utils.pretrained import (load_pretrained_backbone,
                                       resolve_checkpoint_path)
from mscs_tpu.utils.torch_convert import convert_hrnet, convert_swin, t2j_conv


def _randomize_bn_stats(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


@pytest.fixture(scope="module")
def ref_hrnet18():
    m = import_reference_module("models.HRNet")
    torch.manual_seed(0)
    net = m.HighResolutionNet(m.MODEL_CONFIGS["hrnet18"], mixing_layer=True,
                              use_as_backbone=True, return_all_scales=True,
                              align_corners=True)
    _randomize_bn_stats(net)
    return net.eval()


@requires_reference
def test_hrnet_backbone_activation_parity(ref_hrnet18, rng_np):
    """Converted ImageNet-format HRNet weights reproduce the reference
    backbone's activations (concat + all four scales)."""
    x = rng_np.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want_concat, want_feats = ref_hrnet18(torch.from_numpy(x))

    converted = convert_hrnet(ref_hrnet18.state_dict(), "hrnet18")
    jmodel = HighResolutionNet("hrnet18", align_corners=True)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    tmpl = jax.eval_shape(lambda: jmodel.init(jax.random.key(0), xj,
                                              train=False))
    assert (jax.tree_util.tree_map(lambda a: a.shape, tmpl["params"])
            == jax.tree_util.tree_map(lambda a: np.shape(a),
                                      converted["params"]))
    concat, feats = jmodel.apply(converted, xj, train=False)
    np.testing.assert_allclose(
        np.asarray(concat).transpose(0, 3, 1, 2), want_concat.numpy(),
        rtol=1e-4, atol=1e-4)
    for got, want in zip(feats, want_feats):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want.numpy(),
            rtol=1e-4, atol=1e-4)


@requires_reference
@pytest.mark.slow
def test_pretrained_full_path_via_trainer(ref_hrnet18, tmp_path):
    """config graph.pretrained=<path> flows through Trainer into the params."""
    from mscs_tpu.train.trainer import Trainer

    pth = tmp_path / "hrnetv2_w18_imagenet_pretrained.pth"
    torch.save(ref_hrnet18.state_dict(), pth)

    cfg = {
        "name": "t", "mode": "training", "manager": "HRNet",
        "graph": {"model": "HRNet", "backbone": "hrnet18",
                  "align_corners": True, "pretrained": str(pth),
                  "ms_projector": {"mlp": [[1, -1, 1]], "scales": 4, "d": 16,
                                   "use_bn": True}},
        "data": {"dataset": "CITYSCAPES", "experiment": 1,
                 "transforms": ["flip", "torchvision_normalise"],
                 "transform_values": {"crop_shape": [64, 64]},
                 "transforms_val": ["torchvision_normalise"],
                 "transform_values_val": {},
                 "batch_size": 2, "num_workers": 0, "synthetic_length": 2},
        "loss": {"losses": {"CrossEntropyLoss": 1}},
        "train": {"learning_rate": 0.01, "lr_fct": "polynomial",
                  "optim": "SGD", "lr_batchwise": True, "epochs": 1,
                  "momentum": 0.9, "wd": 5e-4, "lr_restarts": [],
                  "lr_restart_vals": 1, "lr_params": {}},
        "valid_freq": 1, "log_every_n_epochs": 1, "seed": 0,
        "synthetic_data": True, "log_path": str(tmp_path),
    }
    trainer = Trainer(cfg)
    got = np.asarray(
        trainer.state.params["backbone"]["stem1"]["conv"]["conv"]["kernel"])
    want = t2j_conv(ref_hrnet18.state_dict()["conv1.weight"].numpy())
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    bs = np.asarray(
        trainer.state.batch_stats["backbone"]["stem1"]["norm"]["bn"]["mean"])
    np.testing.assert_allclose(
        bs, ref_hrnet18.state_dict()["bn1.running_mean"].numpy(),
        rtol=1e-6, atol=1e-6)


@requires_reference
@pytest.mark.slow
def test_pretrained_channel_pad_preserves_function(ref_hrnet18, tmp_path,
                                                   rng_np):
    """ImageNet weights into a channel_pad=64 HRNet: same function, padded
    channels exactly zero."""
    pth = tmp_path / "hrnetv2_w18_imagenet_pretrained.pth"
    torch.save(ref_hrnet18.state_dict(), pth)
    x = rng_np.standard_normal((1, 64, 64, 3)).astype(np.float32)

    def build(channel_pad):
        gcfg = {"model": "HRNet", "dataset": "CITYSCAPES",
                "backbone": "hrnet18", "align_corners": True,
                "pretrained": str(pth), "channel_pad": channel_pad}
        model = HRNet(config=gcfg, experiment=1)
        variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)
        variables = load_pretrained_backbone(variables, gcfg)
        return variables

    v_plain, v_pad = build(0), build(64)
    bb_plain = HighResolutionNet("hrnet18", align_corners=True)
    bb_pad = HighResolutionNet("hrnet18", align_corners=True, channel_pad=64)
    sub = lambda v: {"params": v["params"]["backbone"],
                     "batch_stats": v["batch_stats"]["backbone"]}
    _, feats_plain = bb_plain.apply(sub(v_plain), jnp.asarray(x), train=False)
    _, feats_pad = bb_pad.apply(sub(v_pad), jnp.asarray(x), train=False)
    widths = [18, 36, 72, 144]
    for fp, fq, w in zip(feats_plain, feats_pad, widths):
        np.testing.assert_allclose(np.asarray(fq[..., :w]), np.asarray(fp),
                                   rtol=1e-4, atol=1e-4)
        assert np.all(np.asarray(fq[..., w:]) == 0.0)


@requires_reference
@pytest.mark.slow
def test_swin_full_model_activation_parity(rng_np):
    """Full Swin-T forward (patch embed, shifted windows, merging, per-stage
    norms) matches the reference implementation with converted weights."""
    m = import_reference_module("models.Swin")
    torch.manual_seed(0)
    ref = m.SwinTransformer(pretrained=False, drop_path_rate=0.0,
                            name="swin_tiny")
    ref.eval()  # NB: the reference's train() override returns None
    x = rng_np.standard_normal((1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in ref(torch.from_numpy(x))]

    converted = convert_swin(ref.state_dict(), "swinT")
    jmodel = SwinTransformer("swinT", drop_path_rate=0.0)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    tmpl = jax.eval_shape(lambda: jmodel.init(jax.random.key(0), xj,
                                              train=False))
    assert (jax.tree_util.tree_map(lambda a: a.shape, tmpl["params"])
            == jax.tree_util.tree_map(lambda a: np.shape(a),
                                      converted["params"]))
    outs = jmodel.apply(converted, xj, train=False)
    assert len(outs) == len(want)
    for got, w in zip(outs, want):
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), w,
                                   rtol=2e-4, atol=2e-4)


@requires_reference
@pytest.mark.slow
def test_hrnet_backward_parity_f64(ref_hrnet18, rng_np):
    """Backward semantics match the reference exactly: grads of a scalar
    objective agree to ~1e-9 relative in float64 (train-mode BN, fuse
    resizes, residual adds — the full backprop path).  fp32 curves drift
    chaotically through deep BN backward chains (documented in PARITY.md);
    f64 agreement is the proof that the drift is numerical, not semantic."""
    import copy
    x = rng_np.standard_normal((2, 3, 64, 64)).astype(np.float64)

    net = copy.deepcopy(ref_hrnet18).train()  # don't mutate the fixture
    xt = torch.from_numpy(x)
    net.double()
    out_concat, _ = net(xt)
    loss_t = (out_concat ** 2).mean()
    loss_t.backward()
    t_grad = {k: p.grad.detach().clone() for k, p in net.named_parameters()}

    converted = convert_hrnet(net.state_dict(), "hrnet18")
    jax.config.update("jax_enable_x64", True)
    try:
        c64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), converted)
        jmodel = HighResolutionNet("hrnet18", align_corners=True)

        def loss_fn(params):
            (concat, _), _ = jmodel.apply(
                {"params": params, "batch_stats": c64["batch_stats"]},
                jnp.asarray(x.transpose(0, 2, 3, 1)), train=True,
                mutable=["batch_stats"])
            return (concat ** 2).mean()

        loss_j, grads = jax.value_and_grad(loss_fn)(c64["params"])
        np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-6)
        checks = [
            ("conv1.weight",
             grads["stem1"]["conv"]["conv"]["kernel"], True),
            ("bn1.weight", grads["stem1"]["norm"]["bn"]["scale"], False),
            ("layer1.0.conv1.weight",
             grads["layer1_0"]["cb1"]["conv"]["conv"]["kernel"], True),
            ("stage3.3.branches.0.0.conv1.weight",
             grads["stage3_module3"]["branch0_block0"]["cb1"]["conv"]["conv"]
             ["kernel"], True),
            ("stage4.2.fuse_layers.0.1.0.weight",
             grads["stage4_module2"]["fuse0_1"]["conv"]["conv"]["kernel"],
             True),
        ]
        for tname, jg, is_conv in checks:
            got = np.asarray(jg)
            if is_conv:
                got = got.transpose(3, 2, 0, 1)
            want = t_grad[tname].numpy()
            scale = max(np.abs(want).max(), 1e-12)
            assert np.abs(got - want).max() / scale < 1e-6, tname
    finally:
        jax.config.update("jax_enable_x64", False)


def test_resolve_checkpoint_path_defaults(tmp_path):
    sub = tmp_path / "pytorch_checkpoints" / "hrnet"
    sub.mkdir(parents=True)
    pth = sub / "hrnetv2_w48_imagenet_pretrained.pth"
    pth.write_bytes(b"x")
    gcfg = {"pretrained": True, "backbone": "hrnet48"}
    assert resolve_checkpoint_path(gcfg, str(tmp_path)) == str(pth)
    assert resolve_checkpoint_path({"pretrained": False}, str(tmp_path)) is None


def test_pretrained_missing_is_error_unless_synthetic():
    gcfg = {"pretrained": True, "backbone": "hrnet48"}
    variables = {"params": {"backbone": {}}, "batch_stats": {"backbone": {}}}
    with pytest.raises(FileNotFoundError):
        load_pretrained_backbone(variables, gcfg, data_path="/nonexistent")
    out = load_pretrained_backbone(variables, gcfg, data_path="/nonexistent",
                                   required=False)
    assert out is variables
