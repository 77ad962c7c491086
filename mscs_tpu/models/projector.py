"""Contrastive projector head (single- and multi-scale).

Equivalent of reference ``models/Projector.py``: config ``mlp`` is a list of
``[kernel, channels, stride]`` conv-ReLU(-BN momentum 0.0003) layers (first
layer channels -1 == keep input width), optional SelfAttention (``trans``),
then a final 1x1 linear conv to the ``d``-dim embedding.  ``c_in`` as a list
builds one stack per feature scale and maps list -> list.
"""
from __future__ import annotations

from typing import Any, Union

import jax.numpy as jnp
from flax import linen as nn

from mscs_tpu.models.attention import SelfAttention
from mscs_tpu.models.layers import BatchNorm, Conv


class _ProjectorStack(nn.Module):
    c_in: int
    d: int
    mlp: tuple           # ((k, c, s), ...)
    use_bn: bool
    transformer: bool
    heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_prev = self.c_in
        for layer_id, (k, c_out, s) in enumerate(self.mlp):
            if layer_id == 0 and c_out == -1:
                c_out = c_prev
            p = (k - s + 1) // 2  # ref Projector.py:58
            x = Conv(c_out, k, s, padding=p, use_bias=not self.use_bn,
                     name=f"conv{layer_id}")(x)
            x = nn.relu(x)
            if self.use_bn:
                x = BatchNorm(torch_momentum=0.0003,
                              name=f"bn{layer_id}")(x, train)
            c_prev = c_out
        if self.transformer:
            x = SelfAttention(c_prev, self.heads, name="sa")(x)
        return Conv(self.d, 1, 1, padding=0, name="linear")(x)


class Projector(nn.Module):
    c_in: Union[int, tuple]
    d: int = 128
    mlp: tuple = ()
    use_bn: bool = False
    transformer: bool = False
    heads: int = 1

    @classmethod
    def from_config(cls, config: dict[str, Any], name: str | None = None) -> "Projector":
        c_in = config["c_in"]
        return cls(
            c_in=tuple(c_in) if isinstance(c_in, (list, tuple)) else int(c_in),
            d=config.get("d", 128),
            mlp=tuple(tuple(l) for l in config.get("mlp", [])),
            use_bn=config.get("use_bn", False),
            transformer=config.get("trans", False),
            heads=config.get("heads", 1),
            name=name,
        )

    @property
    def is_ms(self) -> bool:
        return isinstance(self.c_in, tuple)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.is_ms:
            assert isinstance(x, (list, tuple)) and len(x) == len(self.c_in)
            return [
                _ProjectorStack(c, self.d, self.mlp, self.use_bn,
                                self.transformer, self.heads,
                                name=f"project{i}")(xi, train)
                for i, (c, xi) in enumerate(zip(self.c_in, x))
            ]
        if isinstance(x, (list, tuple)):
            assert len(x) == 1
            x = x[0]
        return _ProjectorStack(self.c_in, self.d, self.mlp, self.use_bn,
                               self.transformer, self.heads,
                               name="project")(x, train)
