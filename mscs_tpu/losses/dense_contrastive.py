"""Dense multi-/cross-scale contrastive losses — the scientific core.

TPU-native re-design of reference ``losses/DenseContrastiveLossV2.py`` and
``losses/DenseContrastiveLossV2_ms.py``.  Same math, different machinery:

reference (torch, dynamic shapes)           this rebuild (JAX, static shapes)
-----------------------------------------   ----------------------------------
NN label downsample (F.interpolate)         ops.resize.downsample_labels_nearest
python per-class randperm loop (:117-124)   one batched lax.sort (ops.sampling)
(T·V)² similarity matrix in HBM (:150)      streamed row blocks (ops.infonce)
flag_error zero-loss fallback (:51-53)      validity masks (loss -> exact 0)
stateful ms_losses/cs_losses attrs          pure aux dict output

Config keys and defaults mirror the reference constructors exactly, including
two reference quirks that are preserved deliberately:
- ``cls_counts[:, :-1]`` always drops the last class column (DCV2 :106);
- ``cross_scale_temperature``'s inverted default: if the key IS present the
  value 0.1 is used regardless; otherwise ``temperature`` (DCV2_ms :28).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

from mscs_tpu.data.datasets_info import num_all_classes
from mscs_tpu.ops.infonce import masked_infonce, masked_infonce_cross
from mscs_tpu.ops.pallas_infonce import (
    fits_vmem,
    masked_infonce_cross_pallas,
    masked_infonce_pallas,
)
from mscs_tpu.ops.resize import downsample_labels_nearest
from mscs_tpu.ops.sampling import (
    AnchorSample,
    anchor_capacity,
    sample_anchors,
)

# slot count at/above which 'auto' picks the Pallas InfoNCE engine
_PALLAS_AUTO_M = 8192


@dataclass(frozen=True)
class DenseContrastiveLossV2:
    """Single-scale dense InfoNCE (ref DenseContrastiveLossV2)."""
    dataset: str
    experiment: int
    temperature: float = 0.5
    min_views_per_class: int = 5
    max_views_per_class: int = 2500
    max_features_total: int = 10000
    cross_scale_contrast: bool = False
    label_scaling_mode: str = "nn"
    # 'auto' (measured crossover: pallas >= _PALLAS_AUTO_M slots, xla below)
    # | 'xla' (streamed scan) | 'pallas' (fused VMEM-resident kernel)
    infonce_impl: str = "auto"

    @classmethod
    def from_config(cls, config: dict[str, Any]) -> "DenseContrastiveLossV2":
        return cls(
            dataset=config["dataset"],
            experiment=config["experiment"],
            temperature=config.get("temperature", 0.5),
            min_views_per_class=config.get("min_views_per_class", 5),
            max_views_per_class=config.get("max_views_per_class", 2500),
            max_features_total=config.get("max_features_total", 10000),
            cross_scale_contrast=config.get("cross_scale_contrast", False),
            label_scaling_mode=config.get("label_scaling_mode", "nn"),
            infonce_impl=config.get("infonce_impl", "auto"),
        )

    def _use_pallas(self, c_dim: int = 256) -> bool:
        if self.infonce_impl == "auto":
            # r2 measurement (PERF.md): at the paper's 10000-slot configs the
            # fused-bwd Pallas engine wins (58.2 vs 56.5 img/s end-to-end);
            # at <=2048 slots the two are within tunnel noise — keep the
            # XLA engine there (golden values pin it).  'auto' additionally
            # requires the VMEM-resident kernel to fit the compiler cap at
            # this size (ADVICE r2: never auto-select an uncompilable
            # kernel — very large max_features_total falls back to the
            # streamed XLA path).
            return (self.max_features_total >= _PALLAS_AUTO_M
                    and fits_vmem(anchor_capacity(self.max_features_total),
                                  c_dim))
        return self.infonce_impl == "pallas"

    def _infonce_fn(self, c_dim: int):
        return (masked_infonce_pallas if self._use_pallas(c_dim)
                else masked_infonce)

    @property
    def num_classes(self) -> int:
        return num_all_classes(self.dataset, self.experiment)

    def sample(self, rng: jax.Array, label: jnp.ndarray,
               features: jnp.ndarray) -> AnchorSample:
        """NN-downsample labels to feature resolution, then sample anchors.

        :param label: (N, H, W) int network-id labels (ignore == C-1)
        :param features: (N, h, w, C) projector embeddings
        """
        scale = label.shape[-1] // features.shape[-2]  # width ratio (ref :46)
        dom = downsample_labels_nearest(label, scale)
        assert dom.shape[1:] == features.shape[1:3], (
            f"label {label.shape} at scale {scale} -> {dom.shape} does not "
            f"match features {features.shape}")
        return sample_anchors(
            rng, dom, features,
            num_all_classes=self.num_classes,
            min_views_per_class=self.min_views_per_class,
            max_views_per_class=self.max_views_per_class,
            max_features_total=self.max_features_total,
        )

    def __call__(self, rng: jax.Array, label: jnp.ndarray,
                 features: jnp.ndarray):
        anchors = self.sample(rng, label, features)
        loss = self._infonce_fn(features.shape[-1])(
            anchors.features, anchors.labels, anchors.valid,
            temperature=self.temperature)
        if self.cross_scale_contrast:
            return loss, anchors
        return loss


@dataclass(frozen=True)
class DenseContrastiveLossV2_ms:
    """Multi-scale sum + optional cross-scale contrast (ref DCV2_ms)."""
    dataset: str
    experiment: int
    scales: int = 2
    weights: tuple = ()
    cross_scale_contrast: bool = False
    cross_scale_temperature: float = 0.1
    detach_cs_deepest: bool = False
    w_high_low: float = 1.0
    w_high_mid: float = 1.0
    anchor_groups: int = 1
    scale_loss: DenseContrastiveLossV2 = field(default=None)  # type: ignore

    @classmethod
    def from_config(cls, config: dict[str, Any]) -> "DenseContrastiveLossV2_ms":
        scales = config.get("scales", 2)
        weights = tuple(config.get("weights", [1.0] * scales))
        assert scales == len(weights), (
            f"scales [{scales}] != len(weights) {list(weights)}")
        base = dict(config)
        base["cross_scale_contrast"] = config.get("cross_scale_contrast", False)
        # reference quirk (DCV2_ms :28): presence of the key selects the 0.1
        # literal; absence falls back to the shared temperature.
        cs_temp = (config.get("temperature", 0.5)
                   if "cross_scale_temperature" not in config else 0.1)
        return cls(
            dataset=config["dataset"],
            experiment=config["experiment"],
            scales=scales,
            weights=weights,
            cross_scale_contrast=base["cross_scale_contrast"],
            cross_scale_temperature=cs_temp,
            detach_cs_deepest=config.get("detach_deepest", False),
            w_high_low=config.get("w_high_low", 1.0),
            w_high_mid=config.get("w_high_mid", 1.0),
            anchor_groups=config.get("anchor_groups", 1),
            scale_loss=DenseContrastiveLossV2.from_config(base),
        )

    def __call__(self, rng: jax.Array, label: jnp.ndarray,
                 features: list[jnp.ndarray]):
        """Returns (loss, aux) where aux = {'ms_losses': [...], 'cs_losses': [...]}
        (the reference exposes these as mutable attributes for TB logging).

        ``anchor_groups`` > 1 splits the batch into that many groups and
        computes an independent loss per group (mean over groups).  With
        groups == device count this reproduces the reference's DDP semantics
        exactly: each replica samples anchors only from its local sub-batch
        and its similarity matrix never crosses replicas (SURVEY §2.6 —
        the ref hooks ``concat_all_gather`` but never gathers).  Group loss
        terms are batch-local, so XLA keeps each group's (T·V)² matrix on
        its own shard — no anchor collectives on the wire.  Default 1 =
        one global-batch loss (single-GPU-at-global-batch semantics)."""
        assert len(features) >= self.scales, (
            f"need {self.scales} feature scales, got {len(features)}")
        if self.anchor_groups > 1:
            g = self.anchor_groups
            n = label.shape[0]
            assert n % g == 0, f"batch {n} not divisible by groups {g}"
            lbl_g = label.reshape(g, n // g, *label.shape[1:])
            feats_g = tuple(f.reshape(g, n // g, *f.shape[1:])
                            for f in features[: self.scales])
            rngs = jax.random.split(rng, g)
            losses, auxs = jax.vmap(
                lambda r, l, fs: self._forward(r, l, list(fs))
            )(rngs, lbl_g, feats_g)
            aux = jax.tree.map(jnp.mean, auxs)
            return jnp.mean(losses), aux
        return self._forward(rng, label, features)

    def _forward(self, rng: jax.Array, label: jnp.ndarray,
                 features: list[jnp.ndarray]):
        keys = jax.random.split(rng, self.scales)
        loss = jnp.float32(0.0)
        ms_losses, cs_losses = [], []
        anchor_sets: list[AnchorSample] = []
        for s in range(self.scales):
            anchors = self.scale_loss.sample(keys[s], label, features[s])
            loss_s = self.scale_loss._infonce_fn(features[s].shape[-1])(
                anchors.features, anchors.labels, anchors.valid,
                temperature=self.scale_loss.temperature)
            loss = loss + self.weights[s] * loss_s
            ms_losses.append(jax.lax.stop_gradient(loss_s))
            anchor_sets.append(anchors)

        if self.cross_scale_contrast:
            high = anchor_sets[0]

            cross_fn = (masked_infonce_cross_pallas
                        if self.scale_loss._use_pallas(
                            high.features.shape[-1])
                        else masked_infonce_cross)

            def cs(deep: AnchorSample) -> jnp.ndarray:
                deep_f = (jax.lax.stop_gradient(deep.features)
                          if self.detach_cs_deepest else deep.features)
                return cross_fn(
                    high.features, high.labels, high.valid,
                    deep_f, deep.labels, deep.valid,
                    temperature=self.cross_scale_temperature)

            # highest-res anchors vs lowest-res (ref :65-72)
            loss_cs = cs(anchor_sets[-1])
            loss = loss + self.w_high_low * loss_cs
            cs_losses.append(jax.lax.stop_gradient(loss_cs))
            if self.scales > 2:  # vs second-lowest (ref :74-80)
                loss_cs2 = cs(anchor_sets[-2])
                loss = loss + self.w_high_mid * loss_cs2
                cs_losses.append(jax.lax.stop_gradient(loss_cs2))

        aux = {"ms_losses": ms_losses, "cs_losses": cs_losses}
        return loss, aux
