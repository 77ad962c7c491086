"""mscs_tpu — TPU-native multi-scale & cross-scale contrastive segmentation framework.

A ground-up JAX/Flax/Pallas re-design of the capabilities of
RViMLab/ECCV2022-multi-scale-and-cross-scale-contrastive-segmentation
(ECCV 2022, arXiv 2203.13409): HRNet / DeepLabv3 / OCRNet / UPerNet-Swin
semantic segmentation with per-scale dense InfoNCE contrastive learning and
cross-scale contrast, trained data-parallel over a `jax.sharding.Mesh`.

Layout
------
- ``mscs_tpu.data``     datasets, class-metadata registry, transforms
- ``mscs_tpu.models``   Flax model zoo (NHWC), TTA wrappers
- ``mscs_tpu.ops``      TPU compute primitives (resize, anchor sampling,
                        tiled InfoNCE incl. Pallas kernels, metrics)
- ``mscs_tpu.losses``   loss zoo + weighted LossWrapper
- ``mscs_tpu.parallel`` mesh / collective helpers (DP over ICI)
- ``mscs_tpu.train``    TrainState, schedules, trainer, checkpointing
- ``mscs_tpu.config``   JSON config surface mirroring the reference CLI
"""

__version__ = "0.1.0"
