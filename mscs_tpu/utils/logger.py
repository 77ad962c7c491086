"""Console/file logging + scalar metrics writers.

Replaces the reference's Logger singleton + printlog tee
(``utils/logger.py:31-188``) and its TensorBoard scalar channel
(``managers/LoggingManager.py``): scalars go to JSONL files (one line per
step, trivially plottable and diffable) and optionally to TensorBoard when
``tensorboardX``/torch's writer is importable.
"""
from __future__ import annotations

import json
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


class ScalarWriter:
    """JSONL scalar stream per split (train/valid), TB-compatible in spirit."""

    def __init__(self, log_dir: str | pathlib.Path, split: str):
        path = pathlib.Path(log_dir)
        path.mkdir(parents=True, exist_ok=True)
        self._f = open(path / f"scalars_{split}.jsonl", "a")

    def add_scalars(self, step: int, scalars: dict[str, float]) -> None:
        rec = {"step": int(step)}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()
