"""Accuracy-parity harness: train this framework and the upstream reference
side by side from IDENTICAL weights on IDENTICAL batches, and record the
loss curves (VERDICT round-1 item #3).

The reference implementation is imported read-only from /root/reference (see
tests/_reference_oracle.py) and run on torch CPU; our side runs on jax
(CPU by default for bit-closeness, --platform tpu for speed).  Weights start
from the SAME torch init via utils.torch_convert.convert_hrnet_seg; batches
are seeded numpy arrays fed to both frameworks in the same order; LR/optim
are the paper recipe (SGD momentum .9, wd 5e-4, poly batchwise).

Outputs one JSON with per-step losses from both sides plus summary stats:

  python tools/parity_train.py --loss ce    --steps 40   # deterministic term
  python tools/parity_train.py --loss ms_cs --steps 40   # + stochastic DC

CE is deterministic given weights+batch, so curves must overlay to fp32
tolerance; the DenseContrastive terms sample anchors with framework-native
RNG, so they are compared in distribution (per-step means/stds).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

HW = 128
GRAPH = {
    "model": "HRNet", "dataset": "CITYSCAPES", "backbone": "hrnet48",
    "align_corners": True, "pretrained": False,
}
MS_PROJECTOR = {"mlp": [[1, -1, 1]], "scales": 4, "d": 256, "use_bn": True}
LOSS_CE = {"dataset": "CITYSCAPES", "experiment": 1, "device": "cpu",
           "losses": {"CrossEntropyLoss": 1}}
LOSS_MSCS = {
    "dataset": "CITYSCAPES", "experiment": 1, "device": "cpu",
    "temperature": 0.1, "cross_scale_contrast": True,
    "weights": [1, 0.7, 0.4, 0.1], "scales": 4, "label_scaling_mode": "nn",
    "losses": {"CrossEntropyLoss": 1, "DenseContrastiveLossV2_ms": 0.1},
    "min_views_per_class": 5, "max_views_per_class": 2500,
    "max_features_total": 2048, "dominant_mode": "all",
}
LR, MOMENTUM, WD, POWER = 0.01, 0.9, 5e-4, 0.9


def make_batches(steps: int, bs: int, hw: int, seed: int = 42,
                 blocks: int = 8, signal: bool = False):
    """Deterministic synthetic batches: N(0,1) images + blocky label maps
    (coarse blocks x blocks class grid upsampled).  For ms_cs use blocks=2:
    the deepest contrastive scale sees hw/32 pixels and the REFERENCE crashes
    (torch.min on empty, DenseContrastiveLossV2.py:110) when no class reaches
    min_views there — big regions keep both frameworks on the happy path.

    ``signal=True``: images carry a LEARNABLE class signal (fixed random
    color per class + noise), so a val mIoU endpoint is meaningful — both
    frameworks must learn the same color->class map at the same rate."""
    rng = np.random.default_rng(seed)
    colors = np.random.default_rng(7).normal(size=(19, 3)).astype(np.float32)
    batches = []
    for _ in range(steps):
        coarse = rng.integers(0, 19, (bs, blocks, blocks))
        if blocks == 2:
            # guarantee one class reaches min_views (5) at the deepest
            # (1/32) contrastive scale in EVERY image: duplicate a quadrant
            # (2 quadrants = 8 px of a 4x4 map).  Without this the
            # reference crashes stochastically when all four quadrants are
            # distinct (torch.min on empty, DenseContrastiveLossV2.py:110;
            # hit on the upnswin ms_cs run, r5).
            coarse[:, 1, 1] = coarse[:, 0, 0]
        lbl = np.kron(coarse, np.ones((1, hw // blocks, hw // blocks),
                                      np.int64)).astype(np.int64)
        if signal:
            img = (colors[lbl].transpose(0, 3, 1, 2)
                   + 0.5 * rng.standard_normal((bs, 3, hw, hw))
                   ).astype(np.float32)
        else:
            img = rng.standard_normal((bs, 3, hw, hw)).astype(np.float32)
        batches.append((img, lbl))
    return batches


def _miou_from_preds(preds, labels, num_classes: int = 19) -> float:
    """One shared numpy mIoU for both frameworks — the endpoint metric is
    computed identically regardless of which side produced the argmax."""
    cm = np.zeros((num_classes, num_classes), np.int64)
    for p, l in zip(preds, labels):
        k = (l >= 0) & (l < num_classes)
        cm += np.bincount(num_classes * l[k].astype(np.int64) + p[k],
                          minlength=num_classes ** 2
                          ).reshape(num_classes, num_classes)
    inter = np.diag(cm).astype(np.float64)
    union = cm.sum(0) + cm.sum(1) - inter
    iou = np.where(union > 0, inter / np.maximum(union, 1), np.nan)
    return float(np.nanmean(iou))


def run_reference(batches, loss_name: str, total_steps: int, seed: int = 0,
                  val_batches=None):
    import torch
    from _reference_oracle import import_reference_module

    # the reference hardcodes .cuda() on the CE class weights
    # (losses/LossWrapper.py:26-28); run the oracle on CPU regardless
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore

    hr = import_reference_module("models.HRNet")
    lw = import_reference_module("losses.LossWrapper")
    lrf = import_reference_module("utils.lr_functions")
    torch.manual_seed(seed)
    graph = dict(GRAPH)
    loss_cfg = dict(LOSS_CE if loss_name == "ce" else LOSS_MSCS)
    if loss_name != "ce":
        graph["ms_projector"] = {k: (list(v) if isinstance(v, list) else v)
                                 for k, v in MS_PROJECTOR.items()}
    model = hr.HRNet(graph, experiment=1)
    model.train()
    wrapper = lw.LossWrapper(loss_cfg)
    opt = torch.optim.SGD(model.parameters(), lr=LR, momentum=MOMENTUM,
                          weight_decay=WD)
    # the reference's own schedule callable (utils/lr_functions.py:5-136)
    lr_fct = lrf.LRFcts({"learning_rate": LR, "lr_fct": "polynomial",
                         "lr_batchwise": True, "lr_restart_vals": 1,
                         "lr_params": {}}, [], total_steps)
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_fct)

    curves = []
    sd0 = {k: v.detach().clone() for k, v in model.state_dict().items()}
    for img, lbl in batches:
        x = torch.from_numpy(img)
        y = torch.from_numpy(lbl)
        opt.zero_grad()
        out = model(x)
        if isinstance(out, tuple):
            logits, feats = out
        else:
            logits, feats = out, None
        loss = wrapper(logits, y, deep_features=feats, epoch=1)
        loss.backward()
        opt.step()
        sched.step()
        rec = {"loss": float(loss.detach())}
        rec.update({k: float(v) for k, v in wrapper.loss_vals.items()})
        curves.append(rec)
        print(f"ref step {len(curves)-1}: {rec}", flush=True)

    miou = None
    if val_batches is not None:
        model.eval()
        preds, labels = [], []
        with torch.no_grad():
            for img, lbl in val_batches:
                out = model(torch.from_numpy(img))
                logits = out[0] if isinstance(out, tuple) else out
                preds.append(logits.argmax(1).numpy())
                labels.append(lbl)
        miou = _miou_from_preds(np.concatenate(preds), np.concatenate(labels))
        print(f"ref (seed {seed}) val mIoU: {miou:.4f}", flush=True)
    return sd0, curves, miou


def run_ours(sd0, batches, loss_name: str, total_steps: int, platform: str,
             val_batches=None, bf16: bool = False):
    if platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    if bf16:
        from mscs_tpu.models.layers import set_compute_dtype
        set_compute_dtype("bfloat16")
    from mscs_tpu.losses import LossWrapper
    from mscs_tpu.models import build_model
    from mscs_tpu.train import (TrainState, build_optimizer, make_lr_schedule,
                                make_train_step, output_flags)
    from mscs_tpu.utils.torch_convert import convert_hrnet_seg

    graph = dict(GRAPH)
    loss_cfg = dict(LOSS_CE if loss_name == "ce" else LOSS_MSCS)
    if loss_name != "ce":
        graph["ms_projector"] = dict(MS_PROJECTOR)
    model = build_model(graph, experiment=1)
    wrapper = LossWrapper.from_config(loss_cfg)
    converted = convert_hrnet_seg(sd0, graph, "hrnet48")
    variables = {"params": converted["params"],
                 "batch_stats": converted["batch_stats"]}

    sched = make_lr_schedule(
        {"learning_rate": LR, "lr_fct": "polynomial", "lr_batchwise": True,
         "lr_params": {}}, [], total_steps)
    tx = build_optimizer({"optim": "SGD", "momentum": MOMENTUM,
                          "weight_decay": WD}, sched, variables["params"])
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    has_interm, has_proj = output_flags(graph)
    step = jax.jit(make_train_step(wrapper, 19, has_interm=has_interm,
                                   has_proj=has_proj))
    curves = []
    rng = jax.random.key(0)
    for i, (img, lbl) in enumerate(batches):
        batch = {"image": jnp.asarray(img.transpose(0, 2, 3, 1)),
                 "label": jnp.asarray(lbl.astype(np.int32))}
        state, logs = step(state, batch, jax.random.fold_in(rng, i), 1)
        rec = {k: float(v) for k, v in logs.items()
               if np.ndim(v) == 0 and k != "lr"}
        curves.append(rec)
        print(f"ours step {i}: {rec}", flush=True)

    miou = None
    if val_batches is not None:
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        @jax.jit
        def fwd(variables, image):
            out = model.apply(variables, image, train=False)
            logits = out[0] if isinstance(out, tuple) else out
            return jnp.argmax(logits, axis=-1)

        preds, labels = [], []
        for img, lbl in val_batches:
            preds.append(np.asarray(jax.device_get(
                fwd(variables, jnp.asarray(img.transpose(0, 2, 3, 1))))))
            labels.append(lbl)
        miou = _miou_from_preds(np.concatenate(preds), np.concatenate(labels))
        tag = "bf16" if bf16 else "fp32"
        print(f"ours ({tag}) val mIoU: {miou:.4f}", flush=True)
    if bf16:
        from mscs_tpu.models.layers import set_compute_dtype
        set_compute_dtype("float32")
    return curves, miou


# ---------------------------------------------------------------- upnswin
# The ADE20K paper recipe (configs/ADE20K/upnswin_contrastive_ADE20K.json):
# UPerNet Swin-T + TwoScale CE(0.4/1.0) [+ DC-ms-cs], AdamW 6e-5 wd .01
# betas (.9,.999), linear-warmup-poly batchwise, wd_mult 0 for
# absolute_pos_embed/norm/relative_position_bias_table (ref
# utils/optimizer_utils.py:34-132).  Stochastic paths (drop_path, dropouts)
# are zeroed so the CE term is deterministic given weights+batch.
GRAPH_UPN = {
    "model": "UPerNet", "dataset": "ADE20K", "backbone": "swinT",
    "align_corners": False, "pretrained": False, "out_stride": 32,
    "drop_path_rate": 0.0, "dropout_rate": 0.0,
    "aux_head": {"in_index": 3, "dropout_rate": 0.0},
}
MS_PROJECTOR_UPN = {"mlp": [[1, -1, 1]], "scales": 4, "d": 256,
                    "use_bn": True, "position": "fpn"}
LR_UPN, WD_UPN, BETAS_UPN = 6e-5, 0.01, (0.9, 0.999)
# warmup_iters shrunk from the paper's 1500 so a short run exercises BOTH
# schedule phases; identical on both sides.
WARMUP_ITERS = 10
OPT_KEYS_UPN = {"absolute_pos_embed": {"wd_mult": 0.0},
                "norm": {"wd_mult": 0.0},
                "relative_position_bias_table": {"wd_mult": 0.0}}


def _upn_loss_cfg(loss_name: str) -> dict:
    cfg = {
        "dataset": "ADE20K", "experiment": 1, "device": "cpu",
        "interm": {"name": "CrossEntropyLoss", "args": [], "weight": 0.4},
        "final": {"name": "CrossEntropyLoss", "args": [], "weight": 1.0},
        "losses": {"TwoScaleLoss": 1},
    }
    if loss_name != "ce":
        cfg.update({
            "temperature": 0.1, "cross_scale_contrast": True,
            "weights": [1, 0.7, 0.4, 0.1], "scales": 4,
            "label_scaling_mode": "nn", "dominant_mode": "all",
            "min_views_per_class": 5, "max_views_per_class": 2500,
            "max_features_total": 2048,
            "losses": {"TwoScaleLoss": 1,
                       "DenseContrastiveLossV2_ms": 0.1},
        })
    return cfg


def run_reference_upn(batches, loss_name: str, total_steps: int,
                      seed: int = 0):
    import torch
    from _reference_oracle import import_reference_module

    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU oracle
    up = import_reference_module("models.UPerNet")
    lw = import_reference_module("losses.LossWrapper")
    lrf = import_reference_module("utils.lr_functions")
    ou = import_reference_module("utils.optimizer_utils")
    torch.manual_seed(seed)

    graph = {k: (dict(v) if isinstance(v, dict) else v)
             for k, v in GRAPH_UPN.items()}
    if loss_name != "ce":
        graph["ms_projector"] = {
            k: ([list(x) for x in v] if k == "mlp" else v)
            for k, v in MS_PROJECTOR_UPN.items()}
    model = up.UPerNet(graph, experiment=1)
    model.train()
    # the reference builds its Swin from the HARDCODED backbone_config table
    # (Swin.py:21-37, drop_path_rate 0.3; UPerNet.py:178-183 ignores the
    # graph override) — zero every stochastic module so the CE term is
    # deterministic; ours runs with drop_path_rate 0.0 from the graph.
    for m in model.modules():
        if isinstance(m, (torch.nn.Dropout, torch.nn.Dropout2d)):
            m.p = 0.0
        if hasattr(m, "drop_prob"):
            m.drop_prob = 0.0
    wrapper = lw.LossWrapper(_upn_loss_cfg(loss_name))
    groups = ou.get_param_groups_using_keys(
        model, {"train": {"learning_rate": LR_UPN, "weight_decay": WD_UPN,
                          "opt_keys": OPT_KEYS_UPN}})
    opt = torch.optim.AdamW(groups, lr=LR_UPN, betas=BETAS_UPN,
                            weight_decay=WD_UPN)
    lr_fct = lrf.LRFcts({"learning_rate": LR_UPN,
                         "lr_fct": "linear-warmup-polynomial",
                         "lr_batchwise": True, "lr_restart_vals": 1,
                         "lr_params": {"power": 1.0,
                                       "warmup_iters": WARMUP_ITERS,
                                       "warmup_rate": 1e-6, "min_lr": 0.0}},
                        [], total_steps)
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_fct)

    sd0 = {k: v.detach().clone() for k, v in model.state_dict().items()}
    curves = []
    for img, lbl in batches:
        x, y = torch.from_numpy(img), torch.from_numpy(lbl)
        opt.zero_grad()
        out = model(x)
        if loss_name == "ce":
            interm, logits = out
            feats = None
        else:
            interm, logits, feats = out
        loss = wrapper(logits, y, deep_features=feats,
                       interm_prediction=interm, epoch=1)
        loss.backward()
        opt.step()
        sched.step()
        rec = {"loss": float(loss.detach())}
        rec.update({k: float(v) for k, v in wrapper.loss_vals.items()})
        curves.append(rec)
        print(f"ref step {len(curves)-1}: {rec}", flush=True)
    return sd0, curves, None


def run_ours_upn(sd0, batches, loss_name: str, total_steps: int,
                 platform: str):
    if platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from mscs_tpu.losses import LossWrapper
    from mscs_tpu.models import build_model
    from mscs_tpu.train import (TrainState, build_optimizer, make_lr_schedule,
                                make_train_step, output_flags)
    from mscs_tpu.utils.torch_convert import convert_upernet_seg

    graph = dict(GRAPH_UPN)
    if loss_name != "ce":
        graph["ms_projector"] = dict(MS_PROJECTOR_UPN)
    model = build_model(graph, experiment=1)
    wrapper = LossWrapper.from_config(_upn_loss_cfg(loss_name))
    converted = convert_upernet_seg(sd0, graph, "swinT")

    sched = make_lr_schedule(
        {"learning_rate": LR_UPN, "lr_fct": "linear-warmup-polynomial",
         "lr_batchwise": True,
         "lr_params": {"power": 1.0, "warmup_iters": WARMUP_ITERS,
                       "warmup_rate": 1e-6, "min_lr": 0.0}},
        [], total_steps)
    tx = build_optimizer({"optim": "AdamW", "weight_decay": WD_UPN,
                          "betas": list(BETAS_UPN),
                          "opt_keys": OPT_KEYS_UPN},
                         sched, converted["params"])
    state = TrainState.create(apply_fn=model.apply,
                              params=converted["params"],
                              batch_stats=converted["batch_stats"], tx=tx)
    has_interm, has_proj = output_flags(graph)
    step = jax.jit(make_train_step(wrapper, 150, has_interm=has_interm,
                                   has_proj=has_proj))
    curves = []
    rng = jax.random.key(0)
    for i, (img, lbl) in enumerate(batches):
        batch = {"image": jnp.asarray(img.transpose(0, 2, 3, 1)),
                 "label": jnp.asarray(lbl.astype(np.int32))}
        state, logs = step(state, batch, jax.random.fold_in(rng, i), 1)
        rec = {k: float(v) for k, v in logs.items()
               if np.ndim(v) == 0 and k != "lr"}
        curves.append(rec)
        print(f"ours step {i}: {rec}", flush=True)
    return curves, None


# --------------------------------------------------------------- hrnetocr
# The second ADE20K paper recipe (configs/ADE20K/hrnetocr_contrastive_
# ADE20K.json): OCRNet(HRNet-W48) + TwoScale CE(0.4/1.0) [+ DC-ms-cs],
# SGD lr 0.02 momentum .9 wd 1e-4 poly batchwise.  Reference OCR supports
# ONLY hrnet48 (OCR.py:90-95), so this is W48-sized — keep --hw small.
GRAPH_OCR = {
    "model": "OCRNet", "dataset": "ADE20K", "backbone": "hrnet48",
    "align_corners": True, "pretrained": False, "out_stride": 4,
}
MS_PROJECTOR_OCR = {"mlp": [[1, -1, 1]], "scales": 4, "d": 256,
                    "use_bn": True, "before_context": True}
LR_OCR, WD_OCR = 0.02, 1e-4


def run_reference_ocr(batches, loss_name: str, total_steps: int,
                      seed: int = 0):
    import torch
    from _reference_oracle import import_reference_module

    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU oracle
    oc = import_reference_module("models.OCR")
    lw = import_reference_module("losses.LossWrapper")
    lrf = import_reference_module("utils.lr_functions")
    torch.manual_seed(seed)

    graph = dict(GRAPH_OCR)
    if loss_name != "ce":
        graph["ms_projector"] = {
            k: ([list(x) for x in v] if k == "mlp" else v)
            for k, v in MS_PROJECTOR_OCR.items()}
    model = oc.OCRNet(graph, experiment=1)
    model.train()
    wrapper = lw.LossWrapper(_upn_loss_cfg(loss_name))
    opt = torch.optim.SGD(model.parameters(), lr=LR_OCR, momentum=0.9,
                          weight_decay=WD_OCR)
    lr_fct = lrf.LRFcts({"learning_rate": LR_OCR, "lr_fct": "polynomial",
                         "lr_batchwise": True, "lr_restart_vals": 1,
                         "lr_params": {}}, [], total_steps)
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_fct)

    sd0 = {k: v.detach().clone() for k, v in model.state_dict().items()}
    curves = []
    for img, lbl in batches:
        x, y = torch.from_numpy(img), torch.from_numpy(lbl)
        opt.zero_grad()
        out = model(x)
        if loss_name == "ce":
            interm, logits = out
            feats = None
        else:
            interm, logits, feats = out
        loss = wrapper(logits, y, deep_features=feats,
                       interm_prediction=interm, epoch=1)
        loss.backward()
        opt.step()
        sched.step()
        rec = {"loss": float(loss.detach())}
        rec.update({k: float(v) for k, v in wrapper.loss_vals.items()})
        curves.append(rec)
        print(f"ref step {len(curves)-1}: {rec}", flush=True)
    return sd0, curves, None


def run_ours_ocr(sd0, batches, loss_name: str, total_steps: int,
                 platform: str):
    if platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from mscs_tpu.losses import LossWrapper
    from mscs_tpu.models import build_model
    from mscs_tpu.train import (TrainState, build_optimizer, make_lr_schedule,
                                make_train_step, output_flags)
    from mscs_tpu.utils.torch_convert import convert_ocrnet_seg

    graph = dict(GRAPH_OCR)
    if loss_name != "ce":
        graph["ms_projector"] = dict(MS_PROJECTOR_OCR)
    model = build_model(graph, experiment=1)
    wrapper = LossWrapper.from_config(_upn_loss_cfg(loss_name))
    converted = convert_ocrnet_seg(sd0, graph, "hrnet48")

    sched = make_lr_schedule(
        {"learning_rate": LR_OCR, "lr_fct": "polynomial",
         "lr_batchwise": True, "lr_params": {}}, [], total_steps)
    tx = build_optimizer({"optim": "SGD", "momentum": 0.9,
                          "weight_decay": WD_OCR}, sched,
                         converted["params"])
    state = TrainState.create(apply_fn=model.apply,
                              params=converted["params"],
                              batch_stats=converted["batch_stats"], tx=tx)
    has_interm, has_proj = output_flags(graph)
    step = jax.jit(make_train_step(wrapper, 150, has_interm=has_interm,
                                   has_proj=has_proj))
    curves = []
    rng = jax.random.key(0)
    for i, (img, lbl) in enumerate(batches):
        batch = {"image": jnp.asarray(img.transpose(0, 2, 3, 1)),
                 "label": jnp.asarray(lbl.astype(np.int32))}
        state, logs = step(state, batch, jax.random.fold_in(rng, i), 1)
        rec = {k: float(v) for k, v in logs.items()
               if np.ndim(v) == 0 and k != "lr"}
        curves.append(rec)
        print(f"ours step {i}: {rec}", flush=True)
    return curves, None


def grad_check_f64():
    """One f64 forward+backward on the full hrnet48 seg model + CE from
    identical weights: proves fwd AND bwd semantics match the reference to
    machine precision (the fp32 curves drift only numerically)."""
    import torch
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from _reference_oracle import import_reference_module
    from mscs_tpu.losses import LossWrapper
    from mscs_tpu.models import build_model
    from mscs_tpu.utils.torch_convert import convert_hrnet_seg

    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore
    hr = import_reference_module("models.HRNet")
    lw = import_reference_module("losses.LossWrapper")
    torch.manual_seed(0)
    model = hr.HRNet(dict(GRAPH), experiment=1).double()
    model.train()
    wrapper = lw.LossWrapper(dict(LOSS_CE))
    ce = wrapper.loss_classes["CrossEntropyLoss"]
    ce.weight = ce.weight.double()
    (img, lbl), = make_batches(1, 2, 64)
    out = model(torch.from_numpy(img).double())
    logits = out[0] if isinstance(out, tuple) else out
    loss_t = wrapper(logits, torch.from_numpy(lbl), epoch=1)
    loss_t.backward()
    t_grads = {k: p.grad.detach().clone()
               for k, p in model.named_parameters()}

    jmodel = build_model(dict(GRAPH), experiment=1)
    jwrap = LossWrapper.from_config(dict(LOSS_CE))
    conv = convert_hrnet_seg(model.state_dict(), dict(GRAPH), "hrnet48")
    to64 = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), t)
    params, bstats = to64(conv["params"]), to64(conv["batch_stats"])

    def loss_fn(p):
        out, _ = jmodel.apply(
            {"params": p, "batch_stats": bstats},
            jnp.asarray(img.transpose(0, 2, 3, 1), jnp.float64),
            train=True, mutable=["batch_stats"])
        lg = out[0] if isinstance(out, tuple) else out
        total, _ = jwrap(jax.random.key(0), lg,
                         jnp.asarray(lbl.astype(np.int32)), epoch=1)
        return total

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    checks = {
        "cls_head.2.weight": grads["cls_conv2"]["conv"]["kernel"],
        "backbone.conv1.weight":
            grads["backbone"]["stem1"]["conv"]["conv"]["kernel"],
        "backbone.stage4.2.branches.0.0.conv1.weight":
            grads["backbone"]["stage4_module2"]["branch0_block0"]["cb1"]
            ["conv"]["conv"]["kernel"],
        "backbone.stage2.0.branches.0.0.conv1.weight":
            grads["backbone"]["stage2_module0"]["branch0_block0"]["cb1"]
            ["conv"]["conv"]["kernel"],
    }
    rels = {}
    for tk, jg in checks.items():
        want = t_grads[tk].numpy()
        got = np.asarray(jg).transpose(3, 2, 0, 1)
        rels[tk] = float(np.abs(got - want).max() / max(np.abs(want).max(),
                                                        1e-12))
    result = {"loss_rel_diff": float(abs(float(loss_j) - float(loss_t))
                                     / float(loss_t)),
              "grad_max_rel_diff": rels}
    print(json.dumps(result, indent=1))
    return result


def summarize(ref, ours, loss_name, det_term="CrossEntropyLoss"):
    """det_term: the deterministic supervised term to curve-compare
    (CrossEntropyLoss for hrnet, TwoScaleLoss for upnswin)."""
    ce_r = np.array([r.get(det_term, r["loss"]) for r in ref])
    ce_o = np.array([r.get(det_term, r["loss"]) for r in ours])
    out = {
        "steps": len(ref),
        "ce_max_abs_diff": float(np.max(np.abs(ce_r - ce_o))),
        "ce_mean_abs_diff": float(np.mean(np.abs(ce_r - ce_o))),
        "ce_final_ref": float(ce_r[-1]), "ce_final_ours": float(ce_o[-1]),
    }
    if loss_name != "ce":
        dc_r = np.array([r.get("DenseContrastiveLossV2_ms", np.nan)
                         for r in ref])
        dc_o = np.array([r.get("DenseContrastiveLossV2_ms", np.nan)
                         for r in ours])
        out.update({
            "dc_mean_ref": float(np.nanmean(dc_r)),
            "dc_mean_ours": float(np.nanmean(dc_o)),
            "dc_std_ref": float(np.nanstd(dc_r)),
            "dc_std_ours": float(np.nanstd(dc_o)),
            "dc_mean_rel_gap": float(abs(np.nanmean(dc_r) - np.nanmean(dc_o))
                                     / max(abs(np.nanmean(dc_r)), 1e-9)),
        })
    return out


def endpoint_main(args):
    """Long-horizon head-to-head with a val-mIoU endpoint (VERDICT r2 #2):
    N steps of the MS-CS recipe on learnable synthetic data from identical
    converted init + identical batches; endpoint = shared-numpy val mIoU of
    (a) reference seed 0, (b) reference seed 1 (the run-to-run noise band),
    (c) ours fp32, (d) ours bf16.  Pass criterion: |ours - refA| within the
    |refA - refB| seed band (+small margin)."""
    blocks = args.blocks or 2
    train_b = make_batches(args.steps, args.bs, args.hw, blocks=blocks,
                           signal=True)
    val_b = make_batches(8, args.bs, args.hw, seed=1234, blocks=blocks,
                         signal=True)
    sd0, refA_curves, miou_refA = run_reference(
        train_b, args.loss, args.steps, seed=0, val_batches=val_b)
    _, _, miou_refB = run_reference(
        train_b, args.loss, args.steps, seed=1, val_batches=val_b)
    ours_fp32, miou_fp32 = run_ours(sd0, train_b, args.loss, args.steps,
                                    args.platform, val_batches=val_b)
    _, miou_bf16 = run_ours(sd0, train_b, args.loss, args.steps,
                            args.platform, val_batches=val_b, bf16=True)
    band = abs(miou_refA - miou_refB)
    result = {
        "loss": args.loss, "steps": args.steps, "bs": args.bs, "hw": args.hw,
        "miou_ref_seed0": miou_refA, "miou_ref_seed1": miou_refB,
        "miou_ours_fp32": miou_fp32, "miou_ours_bf16": miou_bf16,
        "seed_band": band,
        "gap_fp32_vs_refA": abs(miou_fp32 - miou_refA),
        "gap_bf16_vs_refA": abs(miou_bf16 - miou_refA),
        "summary_curves": summarize(refA_curves, ours_fp32, args.loss),
    }
    out = args.out or f"logs/parity_endpoint_{args.loss}.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "summary_curves"}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loss", choices=["ce", "ms_cs"], default="ce")
    ap.add_argument("--recipe", choices=["hrnet", "upnswin", "hrnetocr"],
                    default="hrnet",
                    help="upnswin = UPerNet Swin-T + TwoScale + AdamW "
                         "warmup-poly + per-key wd (VERDICT r4 #8); "
                         "hrnetocr = OCRNet(W48) + TwoScale + SGD .02")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--bs", type=int, default=2)
    ap.add_argument("--hw", type=int, default=HW)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--blocks", type=int, default=None,
                    help="label grid (default 8 for ce, 2 for ms_cs)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--grad-check", action="store_true",
                    help="f64 one-step fwd+bwd machine-precision check")
    ap.add_argument("--endpoint", action="store_true",
                    help="long-horizon run with val-mIoU endpoint + "
                         "reference seed-noise band")
    args = ap.parse_args()

    if args.grad_check:
        res = grad_check_f64()
        out = args.out or "logs/parity_gradcheck.json"
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            json.dump(res, f, indent=1)
        return

    if args.endpoint:
        return endpoint_main(args)

    blocks = args.blocks or (2 if args.loss == "ms_cs" else 8)
    batches = make_batches(args.steps, args.bs, args.hw, blocks=blocks)
    if args.recipe == "upnswin":
        sd0, ref_curves, _ = run_reference_upn(batches, args.loss, args.steps)
        our_curves, _ = run_ours_upn(sd0, batches, args.loss, args.steps,
                                     args.platform)
        summary = summarize(ref_curves, our_curves, args.loss,
                            det_term="TwoScaleLoss")
    elif args.recipe == "hrnetocr":
        sd0, ref_curves, _ = run_reference_ocr(batches, args.loss, args.steps)
        our_curves, _ = run_ours_ocr(sd0, batches, args.loss, args.steps,
                                     args.platform)
        summary = summarize(ref_curves, our_curves, args.loss,
                            det_term="TwoScaleLoss")
    else:
        sd0, ref_curves, _ = run_reference(batches, args.loss, args.steps)
        our_curves, _ = run_ours(sd0, batches, args.loss, args.steps,
                                 args.platform)
        summary = summarize(ref_curves, our_curves, args.loss)
    result = {"loss": args.loss, "recipe": args.recipe, "steps": args.steps,
              "bs": args.bs, "hw": args.hw, "summary": summary,
              "ref": ref_curves, "ours": our_curves}
    out = args.out or (f"logs/parity_{args.loss}.json"
                       if args.recipe == "hrnet"
                       else f"logs/parity_{args.recipe}_{args.loss}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"out": out, **summary}))


if __name__ == "__main__":
    main()
