"""Converter structural coverage: the trees produced by convert_hrnet /
convert_swin must have exactly the key structure of the Flax-initialised
models (missing or misnamed nodes would silently skip pretrained weights)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mscs_tpu.models.hrnet import HighResolutionNet
from mscs_tpu.models.swin import SwinTransformer
from mscs_tpu.utils.torch_convert import convert_hrnet, convert_swin


class _Recorder(dict):
    """state_dict stand-in: returns a tiny array for any key, records keys."""

    def __init__(self):
        super().__init__()
        self.requested = set()

    def __getitem__(self, key):
        self.requested.add(key)
        return np.zeros((1, 1, 1, 1), np.float32)

    def __contains__(self, key):
        # converters probe optional keys (downsample, transitions, biases)
        self.requested.add(key)
        return not key.endswith("bias")  # convs in these nets have no bias

    def keys(self):
        # non-'module.'-prefixed so strip_module_prefix keeps this dict
        return iter(("conv1.weight",))

    def __iter__(self):
        return self.keys()


def _paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= _paths(v, prefix + (k,))
        else:
            out.add(prefix + (k,))
    return out


def test_hrnet_converter_structure():
    model = HighResolutionNet("hrnet18")
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.ones((1, 32, 32, 3)),
                           train=False))
    sd = _Recorder()
    converted = convert_hrnet(sd, "hrnet18")
    want_p = _paths(variables["params"])
    got_p = _paths(converted["params"])
    assert got_p == want_p, (
        f"missing: {sorted(want_p - got_p)[:5]} extra: {sorted(got_p - want_p)[:5]}")
    want_b = _paths(variables["batch_stats"])
    got_b = _paths(converted["batch_stats"])
    assert got_b == want_b


def test_swin_converter_structure():
    model = SwinTransformer("swinT", drop_path_rate=0.0)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.ones((1, 56, 56, 3)),
                           train=False))

    class SwinRecorder(_Recorder):
        def __contains__(self, key):
            self.requested.add(key)
            # official swin: biases everywhere EXCEPT the PatchMerging
            # reduction (Linear(bias=False))
            return not key.endswith("reduction.bias")

        def __getitem__(self, key):
            self.requested.add(key)
            if "patch_embed.proj.weight" in key:
                return np.zeros((1, 1, 1, 1), np.float32)
            if key.endswith(".weight") and any(
                    s in key for s in ("qkv", "attn.proj", "fc1", "fc2",
                                       "reduction")):
                return np.zeros((1, 1), np.float32)
            if "relative_position_bias_table" in key:
                return np.zeros((169, 3), np.float32)
            return np.zeros((1,), np.float32)  # norms / biases

    converted = convert_swin(SwinRecorder(), "swinT")
    want_p = _paths(variables["params"])
    got_p = _paths(converted["params"])
    assert got_p == want_p, (
        f"missing: {sorted(want_p - got_p)[:6]} extra: {sorted(got_p - want_p)[:6]}")
