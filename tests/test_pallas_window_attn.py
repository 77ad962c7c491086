"""Fused Pallas window attention == the XLA reference path (fwd + grads).

The kernel (ops/pallas_window_attn.py) absorbs window partition, scores,
relative-position bias, shift mask, softmax and PV into one NHWC kernel;
the XLA path in models/swin.py is the reference-faithful baseline
(ref models/Swin.py:150-230 semantics).  Runs interpreted on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscs_tpu.models.swin import SwinBlock, resolve_attn_impl


def _grads(block, params, x):
    def loss(p):
        return (block.apply(p, x, False) ** 2).mean()
    return jax.grad(loss)(params)


@pytest.mark.parametrize("shift", [0, 3])
@pytest.mark.parametrize("hw", [(14, 14), (10, 12)])  # exact / padded grids
def test_pallas_matches_xla_fwd_and_grads(shift, hw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, *hw, 8)), jnp.float32)
    kw = dict(dim=8, num_heads=2, window_size=7, shift_size=shift,
              mlp_ratio=4.0, qkv_bias=True, drop_path=0.0)
    blk_x = SwinBlock(**kw, attn_impl="xla")
    blk_p = SwinBlock(**kw, attn_impl="pallas")
    params = blk_x.init(jax.random.key(0), x, False)

    ox = blk_x.apply(params, x, False)
    op = blk_p.apply(params, x, False)
    np.testing.assert_allclose(np.asarray(op), np.asarray(ox),
                               rtol=1e-5, atol=1e-5)

    gx = jax.tree.flatten(_grads(blk_x, params, x))[0]
    gp = jax.tree.flatten(_grads(blk_p, params, x))[0]
    for vx, vp in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(vp), np.asarray(vx),
                                   rtol=1e-4, atol=1e-5)


def test_resolve_attn_impl_gates():
    # explicit choices pass through
    assert resolve_attn_impl("xla", 0.0, True) == "xla"
    assert resolve_attn_impl("pallas", 0.5, True) == "pallas"
    # auto: attention dropout active at train time -> XLA fallback
    assert resolve_attn_impl("auto", 0.1, True) == "xla"
    # auto on CPU (this test env) -> xla; eval with attn_drop set is fine
    expected = "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"
    assert resolve_attn_impl("auto", 0.1, False) == expected
    assert resolve_attn_impl("auto", 0.0, True) == expected


def test_multi_head_channels_and_bf16():
    """4 heads x d=8, bf16 activations (the production dtype path)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 14, 14, 32)), jnp.bfloat16)
    kw = dict(dim=32, num_heads=4, window_size=7, shift_size=3,
              mlp_ratio=4.0, qkv_bias=True, drop_path=0.0)
    blk_x = SwinBlock(**kw, attn_impl="xla")
    blk_p = SwinBlock(**kw, attn_impl="pallas")
    params = blk_x.init(jax.random.key(0), x, False)
    ox = np.asarray(blk_x.apply(params, x, False), np.float32)
    op = np.asarray(blk_p.apply(params, x, False), np.float32)
    np.testing.assert_allclose(op, ox, rtol=0.05, atol=0.05)


@pytest.mark.slow
def test_pallas_under_remat_matches_no_remat():
    """use_checkpoint (nn.remat) around blocks containing the custom-vjp
    Pallas kernel: grads must equal the non-remat pallas grads (and the
    xla-path grads) — remat replays the fwd inside the bwd, so a kernel
    whose vjp misbehaves under re-trace would diverge here."""
    from mscs_tpu.models.swin import SwinTransformer

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 28, 28, 3)), jnp.float32)

    def build(remat, impl):
        return SwinTransformer("swinT", drop_path_rate=0.0,
                               remat=remat, attn_impl=impl)

    m0 = build(False, "pallas")
    params = m0.init(jax.random.key(0), x, train=False)

    def loss_fn(model):
        def loss(p):
            outs = model.apply(p, x, train=False)
            return sum((o.astype(jnp.float32) ** 2).mean() for o in outs)
        return loss

    g_plain = jax.grad(loss_fn(m0))(params)
    g_remat = jax.grad(loss_fn(build(True, "pallas")))(params)
    g_xla = jax.grad(loss_fn(build(True, "xla")))(params)
    for vp, vr, vx in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat),
                          jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(vr), np.asarray(vp),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(vr), np.asarray(vx),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shift", [0, 3])
def test_wide_grid_rechunk_matches_xla(shift):
    """Window rows wider than _NWC_MAX are re-chunked (with zero-padded tail
    windows) before the kernel (r5: whole-image TTA shapes overflowed the
    scoped-vmem budget per grid step).  Values and grads must still match
    the XLA path exactly."""
    from mscs_tpu.ops import pallas_window_attn as pwa
    assert pwa._NWC_MAX == 32
    rng = np.random.default_rng(1)
    # 14x245 -> window grid 2x35: nwc 35 > 32 forces the re-chunk (70
    # windows -> 3 rows of 32 with 26 padded); shift exercises the
    # per-window mask reshape
    x = jnp.asarray(rng.normal(size=(1, 14, 245, 8)), jnp.float32)
    kw = dict(dim=8, num_heads=2, window_size=7, shift_size=shift,
              mlp_ratio=4.0, qkv_bias=True, drop_path=0.0)
    blk_x = SwinBlock(**kw, attn_impl="xla")
    blk_p = SwinBlock(**kw, attn_impl="pallas")
    params = blk_x.init(jax.random.key(0), x, False)
    ox = blk_x.apply(params, x, False)
    op = blk_p.apply(params, x, False)
    np.testing.assert_allclose(np.asarray(op), np.asarray(ox),
                               rtol=1e-5, atol=1e-5)
    gx = jax.tree.flatten(_grads(blk_x, params, x))[0]
    gp = jax.tree.flatten(_grads(blk_p, params, x))[0]
    for vx, vp in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(vp), np.asarray(vx),
                                   rtol=1e-4, atol=1e-5)
