"""Console/file logging + scalar metrics writers.

Replaces the reference's Logger singleton + printlog tee
(``utils/logger.py:31-188``) and its TensorBoard scalar channel
(``managers/LoggingManager.py`` SummaryWriter train/valid dirs): scalars
always go to JSONL files (one line per step, trivially plottable and
diffable) AND to TensorBoard event files under ``<log_dir>/tb/<split>``
when torch's SummaryWriter (or tensorboardX) is importable — so pointing
``tensorboard --logdir <run_dir>`` at a run works like upstream.  Set
``MSCS_TB=0`` to disable the TB channel (JSONL remains).
"""
from __future__ import annotations

import json
import os
import pathlib
import sys
import time
from typing import Any


class Logger:
    _file = None

    @classmethod
    def init(cls, log_dir: str | pathlib.Path | None = None,
             name: str = "run") -> None:
        if log_dir is not None:
            path = pathlib.Path(log_dir)
            path.mkdir(parents=True, exist_ok=True)
            cls._file = open(path / f"{name}.log", "a")

    @classmethod
    def info(cls, msg: str) -> None:
        if cls._file is not None:
            cls._file.write(f"{time.strftime('%H:%M:%S')} {msg}\n")
            cls._file.flush()

    @classmethod
    def close(cls) -> None:
        if cls._file is not None:
            cls._file.close()
            cls._file = None


def printlog(*args: Any) -> None:
    msg = " ".join(str(a) for a in args)
    print(msg)
    sys.stdout.flush()
    Logger.info(msg)


def _tb_writer_cls():
    """SummaryWriter class or None; resolved once per process (lazy — the
    torch/tensorboard import costs seconds on small hosts)."""
    if os.environ.get("MSCS_TB", "1") == "0":
        return None
    global _TB_CLS
    try:
        return _TB_CLS
    except NameError:
        pass
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception:
        try:  # pragma: no cover - torch writer exists in the baked image
            from tensorboardX import SummaryWriter
        except Exception:
            SummaryWriter = None
    _TB_CLS = SummaryWriter
    return _TB_CLS


class ScalarWriter:
    """Per-split (train/valid) scalar stream: JSONL always, TB events when
    available (ref LoggingManager's two SummaryWriter dirs)."""

    def __init__(self, log_dir: str | pathlib.Path, split: str):
        path = pathlib.Path(log_dir)
        path.mkdir(parents=True, exist_ok=True)
        self._f = open(path / f"scalars_{split}.jsonl", "a")
        cls = _tb_writer_cls()
        self._tb = (cls(str(path / "tb" / split)) if cls is not None
                    else None)

    def add_scalars(self, step: int, scalars: dict[str, float]) -> None:
        rec = {"step": int(step)}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k != "step":
                    self._tb.add_scalar(k, v, int(step))
            # crash-resilient like the JSONL channel (the reference's
            # write_info_json-after-every-validation rationale)
            self._tb.flush()

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
