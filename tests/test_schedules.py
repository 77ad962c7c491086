"""LR schedule parity vs an oracle of the reference LRFcts math."""
import numpy as np
import pytest

from mscs_tpu.train import convert_restarts_to_steps, make_lr_schedule


def test_polynomial_no_restarts():
    cfg = {"learning_rate": 0.01, "lr_fct": "polynomial", "lr_batchwise": True,
           "lr_params": {"power": 0.9, "min_lr": 0.0}}
    total = 1000
    sched = make_lr_schedule(cfg, [], total)
    for step in [0, 1, 500, 998]:
        want = 0.01 * (1 - step / (total - 1)) ** 0.9
        np.testing.assert_allclose(float(sched(step)), want, rtol=3e-5)
    assert float(sched(total - 1)) == 0.0


def test_linear_warmup_polynomial():
    cfg = {"learning_rate": 6e-5, "lr_fct": "linear-warmup-polynomial",
           "lr_batchwise": True,
           "lr_params": {"power": 1.0, "warmup_iters": 1500,
                         "warmup_rate": 1e-6, "min_lr": 0.0}}
    total = 20000
    sched = make_lr_schedule(cfg, [], total)
    # during warmup
    for step in [0, 700, 1499]:
        want = 6e-5 * (1 - (1 - (step + 1) / 1500) * (1 - 1e-6))
        np.testing.assert_allclose(float(sched(step)), want, rtol=1e-3)
    # after warmup: poly power 1 == linear decay
    for step in [1500, 10000]:
        want = 6e-5 * (1 - step / (total - 1))
        np.testing.assert_allclose(float(sched(step)), want, rtol=1e-3)
    # warmup reaches (almost exactly) base_lr at its last step
    np.testing.assert_allclose(float(sched(1499)), 6e-5, rtol=1e-4)


def test_cosine_with_restarts():
    cfg = {"learning_rate": 0.1, "lr_fct": "cosine", "lr_batchwise": False,
           "lr_restart_vals": 0.5, "lr_params": {}}
    sched = make_lr_schedule(cfg, [100], 200)
    # first segment: cosine from 1.0 over 100 steps
    np.testing.assert_allclose(float(sched(0)), 0.1 * 1.0, rtol=3e-5)
    np.testing.assert_allclose(float(sched(50)),
                               0.1 * 0.5 * (1 + np.cos(np.pi * 0.5)), atol=1e-8)
    # after restart at 100: base val halved
    np.testing.assert_allclose(float(sched(100)), 0.1 * 0.5, rtol=3e-5)


def test_restart_epoch_to_step_conversion():
    bpe = [10] * 5  # 5 epochs x 10 batches
    assert convert_restarts_to_steps([2, 4], bpe) == [20, 40]


def test_polynomial_degenerate_one_step_is_finite():
    """total=1 (debug runs on tiny datasets) must give lr=base, not a
    0/0 nan that silently poisons the first optimizer step (r4)."""
    cfg = {"learning_rate": 0.01, "lr_fct": "polynomial",
           "lr_batchwise": True, "lr_params": {}}
    sched = make_lr_schedule(cfg, [], 1)
    assert np.isfinite(float(sched(0)))
    np.testing.assert_allclose(float(sched(0)), 0.01, rtol=1e-6)
