"""On-chip smoke subset (VERDICT r3 #6) — the TPU equivalent of the
reference's debug-mode-as-integration-harness (SURVEY.md §4).

Everything else in tests/ runs on the 8-device virtual CPU mesh; these run
compiled on the real chip and pin the claims that previously lived only in
PERF.md prose: the bench-config train step makes progress, sliding-window
TTA executes compiled, and the Pallas kernels match their XLA twins in
COMPILED mode (CPU runs them interpreted).

Invocation (documented in README):

    MSCS_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

Without MSCS_TPU_TESTS=1 these are skipped (see conftest.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module", autouse=True)
def _on_chip():
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU backend present")
    from mscs_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache()


def test_flagship_bench_config_loss_decreases():
    """The bench configuration (HRNet-W48 + CE + DC-ms-cs @512², the
    Cityscapes paper graph) trains: 8 repeated steps on one synthetic batch
    must reduce the loss.  Same builder as bench.py/_graft_entry__."""
    from __graft_entry__ import FLAGSHIP_GRAPH, FLAGSHIP_LOSS, \
        _build_train_setup
    from mscs_tpu.models.layers import set_compute_dtype
    set_compute_dtype("bfloat16")  # the blessed default bench mode
    try:
        state, step, batch = _build_train_setup(
            dict(FLAGSHIP_GRAPH), dict(FLAGSHIP_LOSS), batch=8, hw=512)
        step = jax.jit(step, donate_argnums=(0,))
        rng = jax.random.key(0)
        losses = []
        for i in range(8):
            state, logs = step(state, batch, rng, 0)
            losses.append(float(jax.device_get(logs["loss"])))
        assert all(np.isfinite(losses)), losses
        assert losses[-1] < losses[0], losses
    finally:
        set_compute_dtype("float32")


def test_sliding_window_tta_compiled():
    """One sliding-window TTA inference (CTS-protocol engine) executes
    compiled on the chip and returns finite, count-normalised probs."""
    from mscs_tpu.models import build_model
    from mscs_tpu.models.tta import SlidingWindowTTA
    from mscs_tpu.train.state import output_flags, split_outputs

    graph = {"model": "DeepLabv3", "dataset": "CITYSCAPES",
             "backbone": "resnet18", "out_stride": 32,
             "align_corners": True}
    model = build_model(graph, experiment=1)
    x0 = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), x0, train=False)
    has_interm, has_proj = output_flags(graph)

    @jax.jit
    def apply_vars(variables, image):
        outputs = model.apply(variables, image, train=False)
        logits, _, _ = split_outputs(outputs, has_interm, has_proj)
        return logits

    tta = SlidingWindowTTA(lambda img: apply_vars(variables, img), 19,
                           scales=[1.0], flip=True, crop_size=(128, 128),
                           strides=(96, 96), base_size=512, size_mode="long")
    img = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 256, 512, 3)), jnp.float32)
    probs = tta(img)
    assert probs.shape == (1, 256, 512, 19)
    assert bool(jnp.isfinite(probs).all())


def _anchors(rng, m, c, k, n_valid):
    f = rng.standard_normal((m, c)).astype(np.float32)
    l = rng.integers(0, k, m).astype(np.int32)
    v = np.zeros((m,), bool)
    v[:n_valid] = True
    f[~v] = 0.0
    return jnp.asarray(f), jnp.asarray(l), jnp.asarray(v)


def test_pallas_infonce_compiled_gradient_parity():
    """Compiled-mode (Mosaic, not interpreter) Pallas InfoNCE values AND
    gradients == the XLA path — previously only re-verified ad hoc
    (PERF.md r2); this is the repeatable invocation."""
    from mscs_tpu.ops.infonce import masked_infonce, masked_infonce_cross
    from mscs_tpu.ops.pallas_infonce import (masked_infonce_cross_pallas,
                                             masked_infonce_pallas)
    rng = np.random.default_rng(0)
    f, l, v = _anchors(rng, 512, 256, 19, 400)
    want = jax.jit(lambda x: masked_infonce(x, l, v, temperature=0.1))(f)
    got = jax.jit(lambda x: masked_infonce_pallas(x, l, v,
                                                  temperature=0.1))(f)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    g_want = jax.jit(jax.grad(
        lambda x: masked_infonce(x, l, v, temperature=0.1)))(f)
    g_got = jax.jit(jax.grad(
        lambda x: masked_infonce_pallas(x, l, v, temperature=0.1)))(f)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-4, atol=1e-6)

    fa, la, va = _anchors(rng, 512, 256, 19, 500)
    fb, lb, vb = _anchors(rng, 256, 256, 19, 200)
    want = jax.jit(lambda a, b: masked_infonce_cross(
        a, la, va, b, lb, vb, temperature=0.1))(fa, fb)
    got = jax.jit(lambda a, b: masked_infonce_cross_pallas(
        a, la, va, b, lb, vb, temperature=0.1))(fa, fb)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    ga_w, gb_w = jax.jit(jax.grad(lambda a, b: masked_infonce_cross(
        a, la, va, b, lb, vb, temperature=0.1), argnums=(0, 1)))(fa, fb)
    ga_g, gb_g = jax.jit(jax.grad(lambda a, b: masked_infonce_cross_pallas(
        a, la, va, b, lb, vb, temperature=0.1), argnums=(0, 1)))(fa, fb)
    np.testing.assert_allclose(np.asarray(ga_g), np.asarray(ga_w),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb_g), np.asarray(gb_w),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("shift", [0, 3])
def test_pallas_window_attn_compiled_gradient_parity(shift):
    """Compiled-mode fused window attention == the XLA einsum path
    (fwd + grads) at a Swin-realistic width.

    Compared under ``jax.default_matmul_precision('highest')``: the
    runtime's DEFAULT f32 MXU precision is bf16-pass-based and its exact
    pass decomposition is libtpu-version-dependent — a runtime upgrade
    between rounds 4 and 5 moved the two paths ~1e-2 apart at DEFAULT
    while BOTH stayed ~1.4e-2 from exact-f32 CPU.  At 'highest' both
    match CPU f32 to 2e-6 and each other to 5e-7 (r5 measurement), so
    this pins kernel-vs-XLA SEMANTICS rather than the runtime's default
    precision choice (PERF.md r2 fp32-mode precision audit)."""
    from mscs_tpu.models.swin import SwinBlock
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 14, 14, 96)), jnp.float32)
    kw = dict(dim=96, num_heads=3, window_size=7, shift_size=shift,
              mlp_ratio=4.0, qkv_bias=True, drop_path=0.0)
    blk_x = SwinBlock(**kw, attn_impl="xla")
    blk_p = SwinBlock(**kw, attn_impl="pallas")
    with jax.default_matmul_precision("highest"):
        params = blk_x.init(jax.random.key(0), x, False)

        ox = jax.jit(lambda p, x: blk_x.apply(p, x, False))(params, x)
        op = jax.jit(lambda p, x: blk_p.apply(p, x, False))(params, x)
        np.testing.assert_allclose(np.asarray(op), np.asarray(ox),
                                   rtol=1e-5, atol=1e-5)

        def grads(blk):
            return jax.jit(jax.grad(
                lambda p: (blk.apply(p, x, False) ** 2).mean()))(params)

        gx = jax.tree.flatten(grads(blk_x))[0]
        gp = jax.tree.flatten(grads(blk_p))[0]
    for vx, vp in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(vp), np.asarray(vx),
                                   rtol=1e-4, atol=1e-5)
