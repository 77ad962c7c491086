"""Trainer integration: config -> data -> model -> train -> validate ->
checkpoint -> resume, on synthetic data (the reference's debug-mode
integration harness, SURVEY.md §4, as a real test)."""
import json
import pathlib

import numpy as np
import pytest

from mscs_tpu.config import apply_loss_preset, parse_config
from mscs_tpu.train.trainer import Trainer


def _tiny_config(tmp_path, losses=None):
    return {
        "name": "t", "mode": "training",
        "manager": "HRNet",
        "graph": {"model": "DeepLabv3", "backbone": "resnet18",
                  "out_stride": 32, "align_corners": True,
                  "ms_projector": {"mlp": [[1, -1, 1]], "d": 16,
                                   "use_bn": True,
                                   "feats": ["layer1", "layer4"]}},
        "data": {"dataset": "CITYSCAPES", "experiment": 1,
                 "transforms": ["flip", "random_scale", "RandomCropImgLbl",
                                "colorjitter", "torchvision_normalise"],
                 "transform_values": {"crop_shape": [48, 48],
                                      "crop_class_max_ratio": 0.75,
                                      "scale_range": [0.5, 2]},
                 "transforms_val": ["torchvision_normalise"],
                 "transform_values_val": {},
                 "batch_size": 2, "num_workers": 2,
                 "synthetic_length": 6},
        "loss": {"temperature": 0.1, "scales": 2, "weights": [1.0, 0.4],
                 "cross_scale_contrast": True, "max_features_total": 256,
                 "losses": losses or {"CrossEntropyLoss": 1,
                                      "DenseContrastiveLossV2_ms": 0.1}},
        "train": {"learning_rate": 0.01, "lr_fct": "polynomial",
                  "optim": "SGD", "lr_batchwise": True, "epochs": 2,
                  "momentum": 0.9, "wd": 5e-4, "lr_restarts": [],
                  "lr_restart_vals": 1, "lr_params": {}},
        "valid_freq": 1, "log_every_n_epochs": 1, "seed": 0,
        "synthetic_data": True,
        "log_path": str(tmp_path),
    }


def test_trainer_end_to_end(tmp_path):
    trainer = Trainer(_tiny_config(tmp_path))
    metrics = trainer.train()
    assert metrics["best_miou"] >= 0.0
    # artifacts: scalars + info.json + best/last checkpoints
    log_dir = trainer.log_dir
    assert (log_dir / "info.json").exists()
    assert (log_dir / "scalars_train.jsonl").exists()
    assert (log_dir / "chkpts" / "last").exists()
    lines = open(log_dir / "scalars_train.jsonl").read().strip().splitlines()
    rec = json.loads(lines[-1])
    assert np.isfinite(rec["loss"])
    assert "DenseContrastiveLossV2_ms_ms0" in rec  # per-scale loss logging


def test_trainer_resume(tmp_path):
    cfg = _tiny_config(tmp_path)
    t1 = Trainer(cfg)
    t1.train()
    cfg2 = dict(cfg)
    cfg2["run_id"] = t1.run_id  # same log dir
    cfg2["load_checkpoint"] = True
    cfg2["load_last"] = True
    t2 = Trainer(cfg2)
    assert t2.start_epoch >= 1
    assert int(np.asarray(t2.state.step)) > 0


def test_loss_preset_override(tmp_path):
    cfg = _tiny_config(tmp_path)
    cfg["graph"]["model"] = "DeepLabv3"
    out = apply_loss_preset(cfg, "ce")
    assert out["loss"]["losses"] == {"CrossEntropyLoss": 1}
    assert "ms_projector" not in out["graph"]
    out = apply_loss_preset(cfg, "ms_cs")
    assert out["loss"]["cross_scale_contrast"] is True
    assert "DenseContrastiveLossV2_ms" in out["loss"]["losses"]


def test_parse_config_mirrors_reference_surface():
    cfg = parse_config("configs/CITYSCAPES/hrnet_contrastive_CTS.json",
                       user="c", device=-1, dataset=-1, parallel=False)
    assert cfg["graph"]["model"] == "HRNet"
    assert cfg["data"]["experiment"] == 1
    assert cfg["loss"]["losses"] == {"CrossEntropyLoss": 1,
                                     "DenseContrastiveLossV2_ms": 0.1}
    assert cfg["train"]["lr_fct"] == "polynomial"
    # defaults merged
    assert cfg["data"]["repeat_factor_freq_thresh"] == 0.15
    # paper recipes pin DDP per-replica anchor semantics (VERDICT r3 #3):
    # on a multi-chip mesh the Trainer maps this to anchor_groups = n_devices
    assert cfg["loss"]["per_replica_anchors"] is True


def test_trainer_infer_with_tta(tmp_path):
    cfg = _tiny_config(tmp_path)
    cfg["tta"] = True
    cfg["tta_scales"] = [0.5]
    cfg["tta_base_size"] = 48  # keep the CTS long-side protocol test-sized
    cfg["save_outputs"] = True
    trainer = Trainer(cfg)
    result = trainer.infer()
    assert 0.0 <= result["miou"] <= 1.0
    assert any(trainer.log_dir.glob("*_infer_tta.json"))
    # ref layout: outputs/{split}/{submit,debug}/<stem>.png
    assert any((trainer.log_dir / "outputs").glob("*/submit/*.png"))
    assert any((trainer.log_dir / "outputs").glob("*/debug/*.png"))


def test_trainer_demo_tsne_and_diagnostics(tmp_path):
    cfg = _tiny_config(tmp_path)
    trainer = Trainer(cfg)
    trainer.demo_tsne()
    assert any(trainer.log_dir.glob("tsne_scale*.png"))
    trainer.run_diagnostic(n_images=1)
    assert any((trainer.log_dir / "diagnostics").glob("diag_*.png"))


def test_validate_shape_bucketing(tmp_path):
    """Padding to the shape bucket must not change metrics: padded pixels
    carry the ignore id so the confusion matrix excludes them exactly."""
    cfg = _tiny_config(tmp_path)
    trainer = Trainer(cfg)
    img = np.random.default_rng(0).normal(size=(1, 40, 52, 3)).astype(
        np.float32)
    lbl = np.random.default_rng(1).integers(
        0, trainer.num_classes, size=(1, 40, 52))
    cfg_bucket = dict(cfg)
    cfg_bucket["valid_shape_bucket"] = 32
    trainer.config = cfg_bucket
    pimg, plbl, (oh, ow) = trainer._pad_to_bucket(img, lbl)
    assert (oh, ow) == (40, 52)
    assert pimg.shape[1:3] == (64, 64) and plbl.shape[1:3] == (64, 64)
    assert (plbl[:, 40:, :] == trainer.num_classes).all()
    assert (plbl[:, :, 52:] == trainer.num_classes).all()

    from mscs_tpu.ops.metrics import confusion_matrix
    import jax.numpy as jnp
    import jax
    cm_orig = np.asarray(jax.device_get(confusion_matrix(
        jnp.asarray(lbl), jnp.asarray(lbl), trainer.num_classes)))
    cm_pad = np.asarray(jax.device_get(confusion_matrix(
        jnp.asarray(plbl), jnp.asarray(plbl), trainer.num_classes)))
    np.testing.assert_array_equal(cm_orig, cm_pad)

    # bucket off (CITYSCAPES default): passthrough
    trainer.config = cfg
    pimg2, plbl2, _ = trainer._pad_to_bucket(img, lbl)
    assert pimg2.shape == img.shape and plbl2.shape == lbl.shape


@pytest.mark.slow
def test_per_replica_anchors_validation(tmp_path):
    """Regression: per_replica_anchors groups the TRAIN loss by mesh size,
    but validation (bs 1, like upstream's rank-0 eval) must run ungrouped —
    the grouped wrapper used to assert on bs 1 % groups != 0."""
    cfg = _tiny_config(tmp_path)
    cfg["loss"]["per_replica_anchors"] = True
    trainer = Trainer(cfg)
    assert trainer.loss_wrapper is not None
    metrics = trainer.train()  # includes validate() at valid_freq=1, bs 1
    assert np.isfinite(metrics["best_loss"])


def test_resolve_anchor_groups_accepts_explicit_int():
    """ADVICE r4: paper DDP parity (4 replicas x bs 3) must be expressible
    independent of the mesh device count."""
    from mscs_tpu.train.trainer import resolve_anchor_groups
    assert resolve_anchor_groups(True, 8) == 8      # true -> mesh size
    assert resolve_anchor_groups(4, 8) == 4         # int -> pinned count
    assert resolve_anchor_groups(False, 8) is None
    assert resolve_anchor_groups(None, 8) is None


@pytest.mark.slow
def test_trainer_steps_per_call_equivalence(tmp_path):
    """train.steps_per_call=2 (scanned dispatches + unstacked partial tail)
    advances the same trajectory as step-at-a-time: identical step count and
    batch consumption, params equal up to compile-noise (Adam bounds the
    amplification; see test_train_step.test_multistep_matches_sequential)."""
    import jax

    def cfg_with(k):
        cfg = _tiny_config(tmp_path)
        cfg["train"].update({"optim": "Adam", "learning_rate": 1e-4,
                             "steps_per_call": k})
        return cfg

    t1 = Trainer(cfg_with(1))
    s1 = t1.train_one_epoch(0)
    t2 = Trainer(cfg_with(2))
    s2 = t2.train_one_epoch(0)  # 3 batches -> one K=2 group + a partial of 1

    assert int(np.asarray(t2.state.step)) == int(np.asarray(t1.state.step)) == 3
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
    np.testing.assert_allclose(s1["loss"], s2["loss"], rtol=0.05)


@pytest.mark.slow
def test_per_replica_anchors_explicit_int(tmp_path):
    """ADVICE r4 integration: an explicit integer pins the anchor-group
    count independent of the mesh (resolve_anchor_groups returns it
    verbatim rather than the device count); the full train loop must run
    with the pinned grouping."""
    cfg = _tiny_config(tmp_path)
    cfg["loss"]["per_replica_anchors"] = 2
    trainer = Trainer(cfg)
    assert trainer.loss_wrapper is not None
    metrics = trainer.train()
    assert np.isfinite(metrics["best_loss"])
