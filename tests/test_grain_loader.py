"""Grain loader backend: bit-parity with the native loader, determinism.

The Grain backend (`data.loader_backend: "grain"`) must be a drop-in for
the native loader: same epoch order, same per-record augmentation seeding,
same batch dict contract — so the two backends must produce bit-identical
epochs for any config.
"""
import numpy as np
import pytest

from mscs_tpu.data.grain_loader import GrainDataLoader, build_loader
from mscs_tpu.data.loader import DataLoader
from mscs_tpu.data.transforms import transform_rng


class _RandToy:
    """Toy dataset whose 'augmentation' consumes the loader-seeded RNG."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        jitter = transform_rng().normal(size=(4, 4, 3)).astype(np.float32)
        img = np.full((4, 4, 3), i, np.float32) + jitter
        lbl = np.full((4, 4), i, np.int32)
        return img, lbl, {"index": i}


def _epoch(loader, epoch):
    loader.set_epoch(epoch)
    return list(loader)


@pytest.mark.parametrize("epoch", [0, 2])
def test_grain_matches_native_bitwise(epoch):
    ds = _RandToy(13)
    kw = dict(shuffle=True, drop_last=True, num_workers=1, seed=7,
              process_index=0, process_count=1)
    native = _epoch(DataLoader(ds, 3, **kw), epoch)
    grain = _epoch(GrainDataLoader(ds, 3, **kw), epoch)
    assert len(native) == len(grain) == 4
    for bn, bg in zip(native, grain):
        np.testing.assert_array_equal(bn["image"], bg["image"])
        np.testing.assert_array_equal(bn["label"], bg["label"])
        assert bn["metadata"] == bg["metadata"]


def test_grain_drop_last_false_short_tail():
    ds = _RandToy(10)
    ld = GrainDataLoader(ds, 4, shuffle=False, drop_last=False,
                         num_workers=1, process_index=0, process_count=1)
    batches = _epoch(ld, 0)
    assert [b["image"].shape[0] for b in batches] == [4, 4, 2]
    seen = sorted(int(m["index"]) for b in batches for m in b["metadata"])
    assert seen == list(range(10))


def test_grain_multihost_shard_disjoint():
    ds = _RandToy(20)
    loaders = [GrainDataLoader(ds, 2, shuffle=True, num_workers=1, seed=3,
                               process_index=p, process_count=2)
               for p in range(2)]
    seen = []
    for ld in loaders:
        seen.append([int(m["index"]) for b in _epoch(ld, 1)
                     for m in b["metadata"]])
    assert not set(seen[0]) & set(seen[1])
    assert sorted(seen[0] + seen[1]) == list(range(20))


@pytest.mark.slow
def test_grain_worker_processes_same_output():
    """num_workers>1 spawns Grain worker processes; output must not change."""
    ds = _RandToy(8)
    kw = dict(shuffle=True, drop_last=True, seed=11,
              process_index=0, process_count=1)
    inproc = _epoch(GrainDataLoader(ds, 2, num_workers=1, **kw), 0)
    multi = _epoch(GrainDataLoader(ds, 2, num_workers=2, **kw), 0)
    for bn, bg in zip(inproc, multi):
        np.testing.assert_array_equal(bn["image"], bg["image"])
        np.testing.assert_array_equal(bn["label"], bg["label"])


def test_build_loader_dispatch():
    ds = _RandToy(4)
    assert type(build_loader("native", ds, 2)) is DataLoader
    assert type(build_loader("grain", ds, 2)) is GrainDataLoader
    with pytest.raises(ValueError):
        build_loader("tfds", ds, 2)


@pytest.mark.slow
def test_trainer_end_to_end_grain_backend(tmp_path):
    """Full synthetic train loop with data.loader_backend='grain'."""
    from tests.test_trainer import _tiny_config
    from mscs_tpu.train.trainer import Trainer

    cfg = _tiny_config(tmp_path)
    cfg["data"]["loader_backend"] = "grain"
    trainer = Trainer(cfg)
    assert type(trainer.train_loader) is GrainDataLoader
    metrics = trainer.train()
    assert metrics["best_miou"] >= 0.0
