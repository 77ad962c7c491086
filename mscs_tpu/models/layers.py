"""Shared Flax building blocks with torch-compatible geometry.

All models are NHWC (TPU-native layout).  Two parity rules matter for
loading converted torch checkpoints and matching reference activations:

- torch ``Conv2d(padding=p)`` pads symmetrically BEFORE striding; XLA 'SAME'
  pads asymmetrically for even inputs, so convs here always use explicit
  ``((p, p), (p, p))`` padding;
- torch BatchNorm's ``momentum`` m updates ``ra = (1-m)*ra + m*batch``; Flax's
  updates ``ra = m*ra + (1-m)*batch`` — so Flax momentum = 1 - torch momentum
  (the reference uses torch defaults 0.1 everywhere except the 0.0003
  projector/ASPP BNs, ``models/Projector.py:63``, ``models/DeepLabv3.py:150-170``).

Sync-BN note: the reference wraps models in ``SyncBatchNorm`` under DDP
(``managers/BaseManager.py:449-452``).  Here training runs a single jit over a
sharded global batch, so batch statistics are computed over the full global
batch by XLA collectives automatically — sync-BN semantics with zero extra
code.
"""
from __future__ import annotations

import contextvars

import jax
import jax.numpy as jnp
from flax import linen as nn

# Global compute dtype for the model zoo.  Params stay float32; activations
# and conv/matmul compute run in this dtype ('mixed precision' done the TPU
# way — halves HBM activation traffic, the measured bottleneck for HRNet).
_COMPUTE_DTYPE = contextvars.ContextVar("mscs_compute_dtype", default=None)


def set_compute_dtype(dtype) -> None:
    """None/'float32' for reference-faithful fp32; 'bfloat16' for speed."""
    if isinstance(dtype, str):
        dtype = None if dtype == "float32" else jnp.dtype(dtype)
    _COMPUTE_DTYPE.set(dtype)


def compute_dtype():
    return _COMPUTE_DTYPE.get()


def set_matmul_precision(precision: str | None) -> None:
    """MXU passes for float32 matmuls/convs — torch's ``allow_tf32`` dial,
    the TPU way.  On TPU an f32 contraction is emulated in bf16 passes:
    ``'default'`` ≈ 1 pass, ``'high'`` ≈ 3 passes (above A100-TF32
    accuracy), ``'highest'`` ≈ 6 passes (full f32).  JAX's own default is
    ``'default'`` — so the framework's "fp32 mode" numbers (f32 storage +
    DEFAULT-precision convs) mirror what torch gives on an A100 with its
    TF32-by-default convs; profile evidence: the 720-ch cls-head conv runs
    at the same ~165 TF/s in fp32 and bf16 modes (PERF.md r2).  Set
    ``train.matmul_precision: 'highest'`` for true-f32 contractions.
    Irrelevant when activations are bf16 (the blessed default).  None
    leaves the JAX default untouched."""
    if precision:
        jax.config.update("jax_default_matmul_precision", precision)


def torch_bn_momentum(torch_momentum: float) -> float:
    return 1.0 - torch_momentum


class Conv(nn.Module):
    """Conv2d with torch-style symmetric padding (NHWC)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | None = None  # default: k // 2 when stride==1 else torch rule
    dilation: int = 1
    use_bias: bool = True
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        p = self.padding if self.padding is not None else (k // 2) * self.dilation
        return nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=compute_dtype(),
            name="conv",
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm with torch momentum convention; sync across the global batch."""
    torch_momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=torch_bn_momentum(self.torch_momentum),
            epsilon=self.epsilon,
            dtype=compute_dtype(),
            name="bn",
        )(x)


class ConvBN(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | None = None
    dilation: int = 1
    relu: bool = False
    use_bias: bool = False
    torch_momentum: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = Conv(self.features, self.kernel_size, self.stride, self.padding,
                 self.dilation, use_bias=self.use_bias, name="conv")(x)
        x = BatchNorm(self.torch_momentum, name="norm")(x, train)
        if self.relu:
            x = nn.relu(x)
        return x
