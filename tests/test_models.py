"""Model-zoo shape/structure tests (the reference's __main__ smoke blocks,
SURVEY.md §4, as a real test suite)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mscs_tpu.models import build_model
from mscs_tpu.models.swin import SwinTransformer


def _init_apply(model, x, train=False):
    variables = model.init(jax.random.key(0), x, train=train)
    out = model.apply(variables, x, train=train,
                      rngs={"dropout": jax.random.key(1)} if train else None,
                      mutable=["batch_stats"] if train else False)
    return (out[0], variables) if train else (out, variables)


@pytest.mark.slow
def test_deeplabv3_shapes():
    cfg = {"model": "DeepLabv3", "dataset": "CITYSCAPES", "backbone": "resnet50",
           "out_stride": 16, "align_corners": True,
           "ms_projector": {"mlp": [[1, -1, 1]], "d": 64, "use_bn": True,
                            "feats": ["layer1", "layer3", "layer4"]}}
    model = build_model(cfg, 1)
    x = jnp.ones((1, 64, 64, 3))
    (logits, proj), _ = _init_apply(model, x)
    assert logits.shape == (1, 64, 64, 19)
    assert [p.shape for p in proj] == [(1, 16, 16, 64), (1, 4, 4, 64), (1, 4, 4, 64)]


def test_deeplabv3_out_stride_8():
    cfg = {"model": "DeepLabv3", "dataset": "ADE20K", "backbone": "resnet50",
           "out_stride": 8}
    model = build_model(cfg, 1)
    x = jnp.ones((1, 64, 64, 3))
    logits, _ = _init_apply(model, x)
    assert logits.shape == (1, 64, 64, 150)


def test_hrnet18_shapes():
    cfg = {"model": "HRNet", "dataset": "CITYSCAPES", "backbone": "hrnet18",
           "align_corners": True,
           "ms_projector": {"mlp": [[1, -1, 1]], "scales": 4, "d": 32,
                            "use_bn": True}}
    model = build_model(cfg, 1)
    x = jnp.ones((1, 64, 64, 3))
    (logits, proj), _ = _init_apply(model, x)
    assert logits.shape == (1, 64, 64, 19)
    assert [p.shape[1] for p in proj] == [16, 8, 4, 2]
    assert all(p.shape[-1] == 32 for p in proj)


@pytest.mark.slow
def test_ocrnet_resnet_output_order():
    cfg = {"model": "OCRNet", "dataset": "PASCALC", "backbone": "resnet50",
           "out_stride": 8,
           "ms_projector": {"mlp": [[1, -1, 1]], "d": 32, "use_bn": True}}
    model = build_model(cfg, 1)
    x = jnp.ones((1, 64, 64, 3))
    outs, _ = _init_apply(model, x)
    interm, final, proj = outs
    assert interm.shape == final.shape == (1, 64, 64, 59)
    assert len(proj) == 2 and proj[0].shape[-1] == 32


@pytest.mark.slow
def test_swin_backbone_shapes():
    model = SwinTransformer("swinT", drop_path_rate=0.0)
    x = jnp.ones((1, 96, 96, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    outs = model.apply(variables, x, train=False)
    assert [o.shape for o in outs] == [
        (1, 24, 24, 96), (1, 12, 12, 192), (1, 6, 6, 384), (1, 3, 3, 768)]


@pytest.mark.slow
def test_swin_nondivisible_input():
    """Pad-to-window path: input not divisible by 4 * window."""
    model = SwinTransformer("swinT", drop_path_rate=0.0)
    x = jnp.ones((1, 67, 53, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    outs = model.apply(variables, x, train=False)
    assert outs[0].shape == (1, 17, 14, 96)


@pytest.mark.slow
def test_upernet_swin_full_stack():
    cfg = {"model": "UPerNet", "dataset": "ADE20K", "backbone": "swinT",
           "align_corners": False, "drop_path_rate": 0.0,
           "aux_head": {"in_index": 3},
           "ms_projector": {"mlp": [[1, -1, 1]], "scales": 4, "d": 32,
                            "use_bn": True, "position": "fpn"}}
    model = build_model(cfg, 1)
    x = jnp.ones((1, 64, 64, 3))
    outs, _ = _init_apply(model, x)
    interm, final, proj = outs
    assert interm.shape == final.shape == (1, 64, 64, 150)
    assert len(proj) == 4
    assert [p.shape[1] for p in proj] == [16, 8, 4, 2]


def test_train_mode_updates_batch_stats():
    cfg = {"model": "DeepLabv3", "dataset": "CITYSCAPES", "backbone": "resnet50",
           "out_stride": 32}
    model = build_model(cfg, 1)
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    _, updates = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0
               for a, b in zip(after, before))


@pytest.mark.slow
def test_swin_remat_matches_plain(rng_np):
    """use_checkpoint (remat) must not change values."""
    import numpy as np
    x = jnp.ones((1, 56, 56, 3))
    plain = SwinTransformer("swinT", drop_path_rate=0.0, remat=False)
    v = plain.init(jax.random.key(0), x, train=False)
    remat = SwinTransformer("swinT", drop_path_rate=0.0, remat=True)
    outs_p = plain.apply(v, x, train=False)
    outs_r = remat.apply(v, x, train=False)
    for a, b in zip(outs_p, outs_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_swin_remat_rejects_unknown_value():
    """ADVICE r4: 'stage9'/'Stage2'/'true' used to silently disable remat
    (-> unexplained OOM); unknown values must raise at trace time."""
    import pytest
    x = jnp.ones((1, 32, 32, 3))
    for bad in ("stage9", "Stage2", "true"):
        model = SwinTransformer("swinT", drop_path_rate=0.0, remat=bad)
        with pytest.raises(ValueError, match="use_checkpoint"):
            model.init(jax.random.key(0), x, train=False)
    # every valid spelling still traces
    for ok in (False, True, "all", "stage0", "stage3"):
        SwinTransformer("swinT", drop_path_rate=0.0, remat=ok).init(
            jax.random.key(0), x, train=False)


def test_swin_ape_and_dropout_options():
    """Reference surface: ape + drop_rate/attn_drop_rate (ref Swin.py:525-560,
    589-597).  ape adds an interpolated absolute position embedding; dropout
    options must change train-mode outputs but not eval-mode ones."""
    x = jnp.ones((1, 32, 32, 3))
    base = SwinTransformer("swinT", drop_path_rate=0.0)
    ape = SwinTransformer("swinT", drop_path_rate=0.0, ape=True)
    vb = base.init(jax.random.key(0), x, train=False)
    va = ape.init(jax.random.key(0), x, train=False)
    assert "absolute_pos_embed" in va["params"]
    assert va["params"]["absolute_pos_embed"].shape == (1, 56, 56, 96)
    out_b = base.apply(vb, x, train=False)
    out_a = ape.apply(va, x, train=False)
    assert out_a[0].shape == out_b[0].shape
    assert not np.allclose(np.asarray(out_a[0]), np.asarray(out_b[0]))

    drop = SwinTransformer("swinT", drop_path_rate=0.0, drop_rate=0.5,
                           attn_drop_rate=0.25)
    vd = drop.init(jax.random.key(0), x, train=False)
    # eval: dropout inert, same params -> same output as base eval
    e1 = drop.apply(vd, x, train=False)
    e2 = base.apply(vd, x, train=False)
    np.testing.assert_allclose(np.asarray(e1[0]), np.asarray(e2[0]), atol=1e-6)
    # train: two dropout rngs -> different outputs
    t1 = drop.apply(vd, x, train=True, rngs={"dropout": jax.random.key(1)})
    t2 = drop.apply(vd, x, train=True, rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(t1[0]), np.asarray(t2[0]))


def test_return_features_tsne_path():
    """return_features=True returns backbone stage features shallow-first
    (ref BaseManager.py:713-757 t-SNE protocol)."""
    cfg = {"model": "HRNet", "dataset": "CITYSCAPES", "backbone": "hrnet18",
           "align_corners": True,
           "ms_projector": {"mlp": [[1, -1, 1]], "scales": 4, "d": 32,
                            "use_bn": True}}
    model = build_model(cfg, 1)
    x = jnp.ones((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    logits, feats = model.apply(variables, x, train=False,
                                return_features=True)
    assert logits.shape == (1, 64, 64, 19)
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]       # strides 4..32
    assert [f.shape[-1] for f in feats] == [18, 36, 72, 144]  # W18 widths

    cfg2 = {"model": "UPerNet", "dataset": "ADE20K", "backbone": "swinT",
            "align_corners": False, "drop_path_rate": 0.0}
    model2 = build_model(cfg2, 1)
    v2 = model2.init(jax.random.key(0), x, train=False)
    logits2, feats2 = model2.apply(v2, x, train=False, return_features=True)
    assert logits2.shape == (1, 64, 64, 150)
    assert [f.shape[-1] for f in feats2] == [96, 192, 384, 768]


def test_attn_impl_auto_is_grid_size_independent():
    """Wide per-image window grids (whole-image TTA shapes) are handled by
    the kernel's footprint-derived vmem limit (r5: the 16 MB default scoped
    limit overflowed by 192K at nwc=37 — logs/tta_swinl.log); 'auto' no
    longer needs a grid-size fallback and explicit choices are honored."""
    from mscs_tpu.models.swin import resolve_attn_impl
    import jax
    expect = "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"
    assert resolve_attn_impl("auto", 0.0, False, n_windows=1540) == expect
    assert resolve_attn_impl("auto", 0.0, False, n_windows=361) == expect
    assert resolve_attn_impl("pallas", 0.0, False, n_windows=1540) == "pallas"
    assert resolve_attn_impl("xla", 0.0, False) == "xla"
    assert resolve_attn_impl("auto", 0.1, True) == "xla"  # attn dropout
