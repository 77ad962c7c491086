"""Two-scale (auxiliary + final) supervision for OCR / UPerNet heads.

Reference ``losses/TwoScaleLoss.py``: two same-type losses over the
intermediate and final logits, default weights 0.4 / 1.0; the CE pair gets
the Cityscapes class weights and the dataset ignore index.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax.numpy as jnp

from mscs_tpu.data.datasets_info import has_ignore_class, num_all_classes
from mscs_tpu.losses.cross_entropy import CITYSCAPES_CE_WEIGHTS, cross_entropy
from mscs_tpu.losses.lovasz import lovasz_softmax


@dataclass(frozen=True)
class TwoScaleLoss:
    loss_interm: Callable
    loss_final: Callable
    w_interm: float = 0.4
    w_final: float = 1.0

    @classmethod
    def from_config(cls, config: dict[str, Any]) -> "TwoScaleLoss":
        dataset = config["dataset"]
        experiment = config["experiment"]
        n = num_all_classes(dataset, experiment)
        # ref :25-28 — ignore id is C-1 with an ignore class, else C (unused)
        ignore = n - 1 if has_ignore_class(dataset, experiment) else n
        names = (config["interm"]["name"], config["final"]["name"])

        def build(name: str, sub: dict) -> Callable:
            if name == "CrossEntropyLoss":
                weights = (jnp.asarray(CITYSCAPES_CE_WEIGHTS)
                           if dataset == "CITYSCAPES" else None)
                return lambda logits, tgt: cross_entropy(
                    logits, tgt, ignore_index=ignore, class_weights=weights)
            if name == "LovaszSoftmax":
                return lambda logits, tgt: lovasz_softmax(
                    logits, tgt, ignore_index=ignore,
                    classes_to_consider=sub.get("classes_to_consider", "present"),
                    per_image=sub.get("per_image", False))
            raise NotImplementedError(f"TwoScaleLoss sub-loss {name}")

        if names[0] != names[1]:
            raise NotImplementedError(
                f"different interm/final losses: {names}")
        return cls(
            loss_interm=build(names[0], config["interm"]),
            loss_final=build(names[1], config["final"]),
            w_interm=config["interm"].get("weight", 0.4),
            w_final=config["final"].get("weight", 1.0),
        )

    def __call__(self, logits_interm: jnp.ndarray, logits_final: jnp.ndarray,
                 target: jnp.ndarray) -> jnp.ndarray:
        return (self.w_final * self.loss_final(logits_final, target)
                + self.w_interm * self.loss_interm(logits_interm, target))
