"""ScalarWriter observability channels (VERDICT r4 #6).

The reference logs scalars to TensorBoard SummaryWriter train/valid dirs
(managers/LoggingManager.py).  ScalarWriter must (a) always write JSONL and
(b) emit TB event files a stock ``tensorboard --logdir <run>`` can read,
unless MSCS_TB=0 disables the channel.
"""
import json

import pytest

import mscs_tpu.utils.logger as logger_mod
from mscs_tpu.utils.logger import ScalarWriter


def _reset_tb_cls(monkeypatch):
    # _tb_writer_cls caches the resolved class per process; drop the cache
    # so each test sees its own MSCS_TB setting.
    monkeypatch.delattr(logger_mod, "_TB_CLS", raising=False)


def test_jsonl_always_written(tmp_path, monkeypatch):
    monkeypatch.setenv("MSCS_TB", "0")
    _reset_tb_cls(monkeypatch)
    w = ScalarWriter(tmp_path, "train")
    w.add_scalars(3, {"loss": 1.5, "lr": 0.01})
    w.close()
    rec = json.loads((tmp_path / "scalars_train.jsonl").read_text())
    assert rec == {"step": 3, "loss": 1.5, "lr": 0.01}
    assert not (tmp_path / "tb").exists()


def test_tb_events_readable(tmp_path, monkeypatch):
    monkeypatch.setenv("MSCS_TB", "1")
    _reset_tb_cls(monkeypatch)
    pytest.importorskip("torch.utils.tensorboard")
    w = ScalarWriter(tmp_path, "valid")
    w.add_scalars(7, {"miou": 0.42})
    w.close()
    event_files = list((tmp_path / "tb" / "valid").glob("events.out.*"))
    assert event_files, "no TB event file written"
    # read it back with tensorboard's own reader: tag + value must round-trip
    from tensorboard.backend.event_processing.event_accumulator import \
        EventAccumulator
    acc = EventAccumulator(str(tmp_path / "tb" / "valid"))
    acc.Reload()
    assert "miou" in acc.Tags()["scalars"]
    ev = acc.Scalars("miou")[0]
    assert ev.step == 7 and abs(ev.value - 0.42) < 1e-6
