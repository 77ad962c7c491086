"""UPerNet(Swin) seg-model weight conversion vs the imported reference.

VERDICT r4 #8 groundwork: the upnswin train-parity harness starts both
frameworks from IDENTICAL weights, which requires a full-seg converter
(backbone + PPM/FPN + aux head + ms_projector).  This pins (a) tree-exact
structure against our model's init template and (b) eval-mode activation
parity of ALL outputs (interm, logits, per-scale projections) against the
imported reference with the converted weights.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests._reference_oracle import import_reference_module, requires_reference
from mscs_tpu.models import build_model
from mscs_tpu.utils.torch_convert import convert_upernet_seg

GRAPH = {
    "model": "UPerNet", "backbone": "swinT", "out_stride": 32,
    "pretrained": False, "align_corners": False, "dataset": "ADE20K",
    "drop_path_rate": 0.0,
    "aux_head": {"in_index": 3, "dropout_rate": 0.0},
    "dropout_rate": 0.0,
    "ms_projector": {"mlp": [[1, -1, 1]], "scales": 4, "d": 32,
                     "use_bn": True, "position": "fpn"},
}


@requires_reference
def test_upernet_seg_conversion_structure_and_activations(rng_np):
    torch.Tensor.cuda = lambda self, *a, **k: self
    up = import_reference_module("models.UPerNet")
    tg = {k: (dict(v) if isinstance(v, dict) else v) for k, v in GRAPH.items()}
    torch.manual_seed(0)
    ref = up.UPerNet(tg, experiment=1)
    ref.eval()

    converted = convert_upernet_seg(ref.state_dict(), GRAPH, "swinT")
    model = build_model(dict(GRAPH), experiment=1)
    x = rng_np.standard_normal((1, 3, 64, 64)).astype(np.float32)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))

    # (a) tree-exact structure vs the init template
    tmpl = jax.eval_shape(
        lambda: model.init(jax.random.key(0), xj, train=False))
    got_shapes = jax.tree_util.tree_map(np.shape, converted["params"])
    want_shapes = jax.tree_util.tree_map(lambda a: tuple(a.shape),
                                         tmpl["params"])
    assert got_shapes == want_shapes
    assert (jax.tree_util.tree_map(np.shape, converted["batch_stats"])
            == jax.tree_util.tree_map(lambda a: tuple(a.shape),
                                      tmpl["batch_stats"]))

    # (b) activation parity on every output head
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    ref_interm, ref_logits, ref_proj = ref_out

    outs = model.apply({"params": converted["params"],
                        "batch_stats": converted["batch_stats"]},
                       xj, train=False)
    interm, logits, proj = outs

    np.testing.assert_allclose(
        np.asarray(logits).transpose(0, 3, 1, 2), ref_logits.numpy(),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(interm).transpose(0, 3, 1, 2), ref_interm.numpy(),
        rtol=2e-4, atol=2e-4)
    assert len(proj) == len(ref_proj)
    for got, want in zip(proj, ref_proj):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want.numpy(),
            rtol=2e-4, atol=2e-4)
