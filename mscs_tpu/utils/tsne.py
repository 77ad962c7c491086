"""t-SNE feature-embedding demo (ref ``utils/tsne_visualization.py`` +
``BaseManager.demo_tsne`` :701-783).

Accumulates up to ``feats_per_class`` backbone/projector features per class
from NN-downsampled labels, embeds with sklearn t-SNE (replacing tsne-torch),
and renders a class-colored scatter PNG.
"""
from __future__ import annotations

import pathlib

import numpy as np

from mscs_tpu.data.datasets_info import class_names, num_real_classes
from mscs_tpu.ops.resize import downsample_labels_nearest


class TsneManager:
    def __init__(self, dataset: str, experiment: int, scale: int = 32,
                 feats_per_class: int = 1000):
        self.dataset = dataset
        self.experiment = experiment
        self.scale = scale
        self.feats_per_class = feats_per_class
        self.num_classes = num_real_classes(dataset, experiment)
        self._feats: list[np.ndarray] = []
        self._labels: list[np.ndarray] = []
        self._counts = np.zeros((self.num_classes,), np.int64)

    def accumulate(self, features, labels) -> None:
        """features (N,h,w,C) device/np array; labels (N,H,W) network ids."""
        import jax
        feats = np.asarray(jax.device_get(features))
        lbl = np.asarray(jax.device_get(downsample_labels_nearest(
            labels, labels.shape[-1] // feats.shape[-2])))
        f = feats.reshape(-1, feats.shape[-1])
        l = lbl.reshape(-1)
        for c in range(self.num_classes):
            room = self.feats_per_class - self._counts[c]
            if room <= 0:
                continue
            sel = np.nonzero(l == c)[0][:room]
            if len(sel):
                self._feats.append(f[sel])
                self._labels.append(np.full((len(sel),), c))
                self._counts[c] += len(sel)

    def compute_and_plot(self, out_path) -> np.ndarray:
        from sklearn.manifold import TSNE
        feats = np.concatenate(self._feats, axis=0)
        labels = np.concatenate(self._labels, axis=0)
        emb = TSNE(n_components=2, init="pca",
                   perplexity=min(30.0, max(5.0, len(feats) / 50))
                   ).fit_transform(feats)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(8, 8))
        names = class_names(self.dataset, self.experiment)
        for c in range(self.num_classes):
            m = labels == c
            if m.any():
                ax.scatter(emb[m, 0], emb[m, 1], s=2,
                           label=names[c] if c < len(names) else str(c))
        ax.legend(fontsize=6, markerscale=3)
        ax.set_title(f"t-SNE scale {self.scale} ({self.dataset})")
        fig.savefig(pathlib.Path(out_path), dpi=150, bbox_inches="tight")
        plt.close(fig)
        return emb
