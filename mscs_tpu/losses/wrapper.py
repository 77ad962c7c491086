"""Weighted multi-loss composer — functional port of reference LossWrapper.

Reference ``losses/LossWrapper.py``: builds loss instances from
``config['losses'] = {name: weight}``, returns the weighted total and keeps a
``loss_vals`` dict (per-term, plus per-scale ms/cs terms) for logging.  Here
the composer is pure: ``__call__`` returns ``(total, loss_vals)``; component
resolution goes through an explicit registry instead of ``globals()``.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp

from mscs_tpu.data.datasets_info import has_ignore_class, num_all_classes
from mscs_tpu.losses.cross_entropy import CITYSCAPES_CE_WEIGHTS, cross_entropy
from mscs_tpu.losses.dense_contrastive import (
    DenseContrastiveLossV2,
    DenseContrastiveLossV2_ms,
)
from mscs_tpu.losses.lovasz import lovasz_softmax
from mscs_tpu.losses.two_scale import TwoScaleLoss


@dataclass(frozen=True)
class LossWrapper:
    loss_weightings: dict[str, float]
    loss_fns: dict[str, Callable] = field(default_factory=dict)
    dc_off_at_epoch: int | None = None

    @classmethod
    def from_config(cls, config: dict[str, Any]) -> "LossWrapper":
        dataset = config["dataset"]
        experiment = config["experiment"]
        n = num_all_classes(dataset, experiment)
        ignore = n - 1 if has_ignore_class(dataset, experiment) else -100
        fns: dict[str, Callable] = {}
        for name in config["losses"]:
            if name == "CrossEntropyLoss":
                weights = (jnp.asarray(CITYSCAPES_CE_WEIGHTS)
                           if dataset == "CITYSCAPES" else None)
                fns[name] = (lambda w: lambda logits, tgt: cross_entropy(
                    logits, tgt, ignore_index=ignore, class_weights=w))(weights)
            elif name == "LovaszSoftmax":
                fns[name] = lambda logits, tgt: lovasz_softmax(
                    logits, tgt, ignore_index=ignore,
                    classes_to_consider=config.get("classes_to_consider", "present"),
                    per_image=config.get("per_image", False))
            elif name == "DenseContrastiveLossV2":
                fns[name] = DenseContrastiveLossV2.from_config(config)
            elif name == "DenseContrastiveLossV2_ms":
                fns[name] = DenseContrastiveLossV2_ms.from_config(config)
            elif name == "TwoScaleLoss":
                fns[name] = TwoScaleLoss.from_config(config)
            else:
                raise ValueError(f"Loss class '{name}' not recognised")
        return cls(loss_weightings=dict(config["losses"]), loss_fns=fns,
                   dc_off_at_epoch=config.get("dc_off_at_epoch"))

    @property
    def info_string(self) -> str:
        return ", ".join(self.loss_weightings)

    def __call__(self,
                 rng: jax.Array,
                 prediction: jnp.ndarray,
                 labels: jnp.ndarray,
                 deep_features=None,
                 interm_prediction: jnp.ndarray | None = None,
                 epoch: jnp.ndarray | int | None = None,
                 ) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
        """:returns: (total_loss, loss_vals dict for logging).

        Matches the dispatch table of reference LossWrapper.forward (:40-103),
        including the ``dc_off_at_epoch`` schedule that swaps CE-family loss
        off and Lovász on at a given epoch.
        """
        total = jnp.float32(0.0)
        loss_vals: dict[str, jnp.ndarray] = {}
        for name, weight in self.loss_weightings.items():
            fn = self.loss_fns[name]
            aux = None
            if name == "LovaszSoftmax":
                loss = fn(prediction, labels)
                if self.dc_off_at_epoch is not None and epoch is not None:
                    loss = jnp.where(jnp.asarray(epoch) < self.dc_off_at_epoch,
                                     0.0, loss)
            elif name == "TwoScaleLoss":
                assert interm_prediction is not None, \
                    "TwoScaleLoss needs interm_prediction"
                loss = fn(interm_prediction, prediction, labels)
            elif name == "DenseContrastiveLossV2":
                assert deep_features is not None
                out = fn(rng, labels, deep_features)
                loss = out[0] if isinstance(out, tuple) else out
            elif name == "DenseContrastiveLossV2_ms":
                assert deep_features is not None
                loss, aux = fn(rng, labels, deep_features)
            elif name == "CrossEntropyLoss":
                loss = fn(prediction, labels)
            else:  # registry guarantees this is unreachable
                loss = jnp.float32(0.0)
            loss = loss * weight
            loss_vals[name] = jax.lax.stop_gradient(loss)
            if aux is not None:
                for s, v in enumerate(aux.get("ms_losses", [])):
                    loss_vals[f"{name}_ms{s}"] = v
                for s, v in enumerate(aux.get("cs_losses", [])):
                    loss_vals[f"{name}_cs{s}"] = v
            total = total + loss
        return total, loss_vals
