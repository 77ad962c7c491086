"""OCRNet(HRNet-W48) seg-model weight conversion vs the imported reference.

Completes the converted-weight parity triangle over the three paper
recipes (hrnet r1-3, upnswin r5, hrnetocr here): tree-exact structure
against our init template and eval-mode activation parity of ALL outputs
(interm, logits, per-scale projections) with converted weights.  The
reference hardcodes hrnet48 as the only HRNet OCR backbone (OCR.py:90-95).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests._reference_oracle import import_reference_module, requires_reference
from mscs_tpu.models import build_model
from mscs_tpu.utils.torch_convert import convert_ocrnet_seg

GRAPH = {
    "model": "OCRNet", "backbone": "hrnet48", "out_stride": 4,
    "pretrained": False, "align_corners": True, "dataset": "ADE20K",
    "ms_projector": {"mlp": [[1, -1, 1]], "scales": 4, "d": 32,
                     "use_bn": True, "before_context": True},
}


@requires_reference
def test_ocrnet_seg_conversion_structure_and_activations(rng_np):
    torch.Tensor.cuda = lambda self, *a, **k: self
    oc = import_reference_module("models.OCR")
    tg = {k: (dict(v) if isinstance(v, dict) else v) for k, v in GRAPH.items()}
    torch.manual_seed(0)
    ref = oc.OCRNet(tg, experiment=1)
    ref.eval()

    converted = convert_ocrnet_seg(ref.state_dict(), GRAPH, "hrnet48")
    model = build_model(dict(GRAPH), experiment=1)
    x = rng_np.standard_normal((1, 3, 64, 64)).astype(np.float32)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))

    tmpl = jax.eval_shape(
        lambda: model.init(jax.random.key(0), xj, train=False))
    assert (jax.tree_util.tree_map(np.shape, converted["params"])
            == jax.tree_util.tree_map(lambda a: tuple(a.shape),
                                      tmpl["params"]))
    assert (jax.tree_util.tree_map(np.shape, converted["batch_stats"])
            == jax.tree_util.tree_map(lambda a: tuple(a.shape),
                                      tmpl["batch_stats"]))

    with torch.no_grad():
        ref_interm, ref_logits, ref_proj = ref(torch.from_numpy(x))

    interm, logits, proj = model.apply(
        {"params": converted["params"],
         "batch_stats": converted["batch_stats"]}, xj, train=False)

    np.testing.assert_allclose(
        np.asarray(interm).transpose(0, 3, 1, 2), ref_interm.numpy(),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(logits).transpose(0, 3, 1, 2), ref_logits.numpy(),
        rtol=2e-4, atol=2e-4)
    assert len(proj) == len(ref_proj)
    for got, want in zip(proj, ref_proj):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want.numpy(),
            rtol=2e-4, atol=2e-4)
