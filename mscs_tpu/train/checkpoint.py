"""Checkpoint save/load with the reference's best/last layout.

Reference ``managers/LoggingManager.py:293-368``: ``chkpts/chkpt_best.pt`` on
new-best mIoU, ``chkpt_epoch_{E}.pt`` periodically, each holding step/epoch/
model/optimizer/scheduler state + best metrics; resume restores all of it.
Here the same layout maps to orbax: ``chkpts/best`` and ``chkpts/epoch_E``
directories holding the TrainState pytree + metadata.
"""
from __future__ import annotations

import json
import pathlib
from typing import Any

import jax
import orbax.checkpoint as ocp


def _tree_state(state) -> dict[str, Any]:
    return {"step": state.step, "params": state.params,
            "batch_stats": state.batch_stats, "opt_state": state.opt_state}


class CheckpointManager:
    def __init__(self, log_dir: str | pathlib.Path):
        self.dir = pathlib.Path(log_dir).absolute() / "chkpts"
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def save(self, state, epoch: int, best_miou: float, best_loss: float,
             is_best: bool = False, tag: str | None = None) -> pathlib.Path:
        name = tag or ("best" if is_best else f"epoch_{epoch:03d}")
        path = self.dir / name
        self._ckptr.save(path, jax.device_get(_tree_state(state)), force=True)
        meta = {"epoch": int(epoch), "global_step": int(jax.device_get(state.step)),
                "best_miou": float(best_miou), "best_loss": float(best_loss),
                "is_best": bool(is_best)}
        with open(path / "meta.json", "w") as f:
            json.dump(meta, f)
        return path

    def latest(self) -> pathlib.Path | None:
        cands = sorted(self.dir.glob("epoch_*"))
        return cands[-1] if cands else None

    def load(self, state, which: str = "best", from_dir=None):
        """:param which: 'best' | 'last' | explicit directory name.
        :param from_dir: another run's chkpts dir (ref ``-cpt run_id``
        resume, BaseManager.py:76-82)."""
        base = pathlib.Path(from_dir) if from_dir else self.dir
        if which == "last":
            cands = sorted(base.glob("epoch_*")) + [base / "last"]
            cands = [c for c in cands if c.exists()]
            path = cands[-1] if cands else base / "best"
        else:
            path = base / which
        if not path.exists() or not any(path.iterdir()):
            raise FileNotFoundError(
                f"no '{which}' checkpoint under {base} — pass -cpt with the "
                f"run id of a TRAINING run (its chkpts/ dir must contain "
                f"'best' or 'epoch_*'/'last')")
        restored = self._ckptr.restore(
            path, item=jax.device_get(_tree_state(state)))
        with open(path / "meta.json") as f:
            meta = json.load(f)
        new_state = state.replace(
            step=jax.numpy.asarray(restored["step"]),
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"])
        return new_state, meta
