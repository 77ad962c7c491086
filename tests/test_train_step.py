"""End-to-end train step: model + LossWrapper + optimizer under jit, single
device and sharded over the 8-device virtual CPU mesh (DP + implicit
sync-BN) — the multi-device semantics torch DDP could never unit-test."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mscs_tpu.losses import LossWrapper
from mscs_tpu.models import build_model
from mscs_tpu.parallel import batch_sharding, make_mesh, replicate, shard_batch
from mscs_tpu.train import (
    TrainState,
    build_optimizer,
    make_lr_schedule,
    make_train_multistep,
    make_train_step,
    output_flags,
)


def _tiny_setup(rng_np, batch=2, hw=32, lr=0.01, optim="SGD"):
    graph = {"model": "DeepLabv3", "dataset": "CITYSCAPES",
             "backbone": "resnet18", "out_stride": 32, "align_corners": True,
             "ms_projector": {"mlp": [[1, -1, 1]], "d": 16, "use_bn": True,
                              "feats": ["layer1", "layer4"]}}
    loss_cfg = {"dataset": "CITYSCAPES", "experiment": 1, "device": None,
                "temperature": 0.1, "scales": 2, "weights": [1.0, 0.4],
                "cross_scale_contrast": True, "max_features_total": 256,
                "losses": {"CrossEntropyLoss": 1,
                           "DenseContrastiveLossV2_ms": 0.1}}
    model = build_model(graph, 1)
    wrapper = LossWrapper.from_config(loss_cfg)
    x = jnp.asarray(rng_np.standard_normal((batch, hw, hw, 3)), jnp.float32)
    y = jnp.asarray(rng_np.integers(0, 20, (batch, hw, hw)), jnp.int32)
    variables = model.init(jax.random.key(0), x, train=False)
    sched = make_lr_schedule({"learning_rate": lr, "lr_fct": "polynomial",
                              "lr_batchwise": True, "lr_params": {}}, [], 100)
    tx = build_optimizer({"optim": optim, "momentum": 0.9,
                          "weight_decay": 5e-4}, sched, variables["params"])
    state = TrainState.create(apply_fn=model.apply, params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    has_interm, has_proj = output_flags(graph)
    step = make_train_step(wrapper, 19, has_interm=has_interm,
                           has_proj=has_proj)
    return state, step, {"image": x, "label": y}


def test_train_step_single_device(rng_np):
    state, step, batch = _tiny_setup(rng_np)
    step = jax.jit(step)
    new_state, logs = step(state, batch, jax.random.key(0), 0)
    assert int(new_state.step) == 1
    assert np.isfinite(float(logs["loss"]))
    assert float(logs["CrossEntropyLoss"]) > 0
    # params actually moved
    diff = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                        state.params, new_state.params)
    assert max(jax.tree.leaves(diff)) > 0
    # confusion matrix accumulated over non-ignore pixels of the full batch
    want = int((np.asarray(batch["label"]) < 19).sum())
    assert int(np.asarray(logs["confusion"]).sum()) == want


@pytest.mark.slow
def test_train_step_sharded_8dev(rng_np):
    assert jax.device_count() == 8, "conftest must force 8 cpu devices"
    mesh = make_mesh()
    state, step, batch = _tiny_setup(rng_np, batch=8)
    state = replicate(mesh, state)
    batch = shard_batch(mesh, batch)
    step = jax.jit(step)
    new_state, logs = step(state, batch, jax.random.key(0), 0)
    assert np.isfinite(float(logs["loss"]))
    # gradients were all-reduced: params remain replicated & identical
    p = jax.tree.leaves(new_state.params)[0]
    assert p.sharding.is_fully_replicated


def test_multistep_semantics_exact():
    """Scan threading is EXACTLY K sequential calls: batch order along the
    step axis, rng/epoch pass-through, step-dependent state updates, and the
    log reduction (confusion summed, scalars averaged) — checked bitwise with
    a deterministic arithmetic step where compile noise cannot hide bugs."""
    def fake_step(state, batch, rng, epoch):
        k = state["step"]
        noise = jax.random.fold_in(rng, k)
        upd = batch["image"].mean() * (k + 1).astype(jnp.float32) + (
            jax.random.uniform(noise, ()) + jnp.float32(epoch))
        new = {"step": k + 1, "w": state["w"] + upd}
        logs = {"loss": upd,
                "confusion": jnp.full((2, 2), k + 1, jnp.int32)}
        return new, logs

    rng = jax.random.key(3)
    state = {"step": jnp.zeros((), jnp.int32), "w": jnp.zeros((), jnp.float32)}
    batches = [{"image": jnp.full((2, 4), float(i + 1))} for i in range(3)]

    seq, seq_logs = state, []
    jstep = jax.jit(fake_step)
    for b in batches:
        seq, logs = jstep(seq, b, rng, 5)
        seq_logs.append(jax.device_get(logs))

    stacked = {"image": jnp.stack([b["image"] for b in batches])}
    ms, ms_logs = jax.jit(make_train_multistep(fake_step))(state, stacked,
                                                           rng, 5)
    assert int(ms["step"]) == 3
    np.testing.assert_array_equal(np.asarray(ms["w"]), np.asarray(seq["w"]))
    np.testing.assert_array_equal(
        np.asarray(ms_logs["loss"]),
        np.mean([l["loss"] for l in seq_logs], dtype=np.float32))
    np.testing.assert_array_equal(
        np.asarray(ms_logs["confusion"]),
        sum(np.asarray(l["confusion"]) for l in seq_logs))


@pytest.mark.slow
def test_multistep_matches_sequential(rng_np):
    """One scanned dispatch of K real train steps tracks K sequential calls.

    The scanned and unscanned bodies compile to slightly different (but
    equally valid) fused programs, so trajectories agree only up to float
    noise; Adam + small lr bounds the amplification (a fresh-init toy net
    has ~1e5-magnitude gradients that explode chaotically under SGD).
    Exact threading semantics are proven in test_multistep_semantics_exact."""
    state, step, _ = _tiny_setup(rng_np, lr=1e-4, optim="Adam")
    rng = jax.random.key(7)
    batches = []
    for _ in range(3):
        x = jnp.asarray(rng_np.standard_normal((2, 32, 32, 3)), jnp.float32)
        y = jnp.asarray(rng_np.integers(0, 20, (2, 32, 32)), jnp.int32)
        batches.append({"image": x, "label": y})

    jstep = jax.jit(step)
    seq_state, seq_logs = state, []
    for b in batches:
        seq_state, logs = jstep(seq_state, b, rng, 0)
        seq_logs.append(jax.device_get(logs))

    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
    ms_state, ms_logs = jax.jit(make_train_multistep(step))(
        state, stacked, rng, 0)

    assert int(ms_state.step) == 3
    for a, b in zip(jax.tree.leaves(seq_state.params),
                    jax.tree.leaves(ms_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
    np.testing.assert_allclose(
        float(ms_logs["loss"]),
        np.mean([float(l["loss"]) for l in seq_logs]), rtol=0.05)
    # pixel totals are invariant to float noise (argmax flips move counts
    # between cells, never in/out of the matrix)
    assert (int(np.asarray(ms_logs["confusion"]).sum())
            == sum(int(np.asarray(l["confusion"]).sum()) for l in seq_logs))


def test_sharded_matches_single_device(rng_np):
    """Same global batch -> same loss whether on 1 or 8 devices (sync-BN +
    global CE/contrastive semantics under jit)."""
    state, step, batch = _tiny_setup(rng_np, batch=8)
    _, logs_single = jax.jit(step)(state, batch, jax.random.key(0), 0)

    mesh = make_mesh()
    state_s = replicate(mesh, state)
    batch_s = shard_batch(mesh, batch)
    _, logs_sharded = jax.jit(step)(state_s, batch_s, jax.random.key(0), 0)
    np.testing.assert_allclose(float(logs_single["loss"]),
                               float(logs_sharded["loss"]), rtol=2e-4)
