"""Real-data-day walker: the ordered checklist for the first day this
framework meets real datasets + reference checkpoints (VERDICT r3 #4).

Each step names the existing tool/test it wraps and prints PASS/FAIL with
the measured number; a summary JSON lands in logs/real_data_day.json.
RUNBOOK.md documents every step's expected tolerance and the exact real-data
commands.

    python tools/real_data_day.py --dry-run
        Walks EVERY step against fake trees + fabricated reference-format
        checkpoints (tiny hrnet18, no real data needed) — proves the
        machinery end-to-end before the real day.

    python tools/real_data_day.py --data-path /data/CITYSCAPES \
        [--config configs/CITYSCAPES/hrnet_contrastive_CTS.json] \
        [--ref-checkpoint /path/chkpt_best.pt] [--records 8] [--steps ...]
        The real thing: dataset tree check -> ImageNet weight conversion ->
        eval-parity vs the imported reference -> validate() sanity ->
        short-train -> TTA+submission smoke; prints the full-recipe command
        last.

Reference anchors: BASELINE.md north star (Cityscapes val mIoU 82.8 +- 0.2);
reference run commands README.md:48-56.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

STEPS = ["tree", "convert", "eval_parity", "validate", "short_train",
         "tta_submit", "full_recipe"]


# --------------------------------------------------------------------- fakes
def _write_png(path, arr):
    from PIL import Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def make_fake_cityscapes(root: str, n_train: int = 4, n_val: int = 3,
                         hw=(96, 128)) -> None:
    """Minimal tree with the reference's exact naming/layout
    (datasets/Cityscapes.py:103-253; same helper family as
    tests/test_fake_trees.py)."""
    rng = np.random.default_rng(0)
    for split, n in [("train", n_train), ("val", n_val)]:
        for i in range(n):
            name = f"faketown_{i:06d}_000019"
            img = rng.integers(0, 256, (*hw, 3), np.uint8)
            # raw labelIds 0..33 (remap_mask maps to train ids + 255-ignore)
            lbl = rng.integers(0, 34, hw).astype(np.uint8)
            _write_png(os.path.join(root, "leftImg8bit", split, "faketown",
                                    f"{name}_leftImg8bit.png"), img)
            _write_png(os.path.join(root, "gtFine", split, "faketown",
                                    f"{name}_gtFine_labelIds.png"), lbl)


def make_fake_ade20k(root: str, n_train: int = 4, n_val: int = 3) -> None:
    """Minimal ADEChallengeData2016 tree, variable per-record shapes like the
    real dataset (datasets/ADE20K.py:17-147; same helper family as
    tests/test_fake_trees.py::_make_ade20k_tree) — exercises the
    variable-shape bucketed validate path."""
    rng = np.random.default_rng(0)
    base = os.path.join(root, "ADEChallengeData2016")
    for split, n in [("training", n_train), ("validation", n_val)]:
        for i in range(n):
            name = f"ADE_{split[:5]}_{i:08d}"
            h, w = (96, 128) if i % 2 == 0 else (128, 96)
            img = rng.integers(0, 256, (h, w, 3), np.uint8)
            lbl = rng.integers(0, 151, (h, w)).astype(np.uint8)
            _write_png(os.path.join(base, "images", split, f"{name}.jpg"),
                       img)
            _write_png(os.path.join(base, "annotations", split,
                                    f"{name}.png"), lbl)


def make_fake_imagenet_ckpt(root: str, variant: str = "hrnet18") -> str:
    """Fabricate the ImageNet init checkpoint from the IMPORTED reference
    backbone (random init — format-exact, value-arbitrary).  Same technique
    as tests/test_pretrained.py::test_pretrained_full_path.  HRNet variants
    save a bare state_dict under pytorch_checkpoints/hrnet/, Swin variants
    the official ``{'model': sd}`` layout under swin_imagenet/ (ref
    Swin.py:674-695)."""
    import torch
    from _reference_oracle import import_reference_module
    torch.manual_seed(0)
    if variant.startswith("hrnet"):
        m = import_reference_module("models.HRNet")
        net = m.HighResolutionNet(m.MODEL_CONFIGS[variant],
                                  mixing_layer=True, align_corners=True)
        path = os.path.join(root, "pytorch_checkpoints", "hrnet",
                            f"hrnetv2_w{variant[len('hrnet'):]}"
                            "_imagenet_pretrained.pth")
        payload = net.state_dict()
    else:
        from mscs_tpu.utils.pretrained import SWIN_CHECKPOINT_NAMES
        m = import_reference_module("models.Swin")
        stem = SWIN_CHECKPOINT_NAMES[variant]
        net = m.SwinTransformer(pretrained=False, name=stem)
        path = os.path.join(root, "pytorch_checkpoints", "swin_imagenet",
                            f"{stem}_patch4_window7_224.pth")
        payload = {"model": net.state_dict()}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    torch.save(payload, path)
    return path


def make_fake_trained_ckpt(root: str) -> tuple[str, dict]:
    """Fabricate a trained reference checkpoint in the reference's own
    save_checkpoint format (LoggingManager.py:293-319: dict with
    'model_state_dict') around the imported reference seg model.  The
    reference HRNet seg class is hardcoded to hrnet48 (HRNet.py:563-566),
    so the fake checkpoint is W48 too (eval-only, no projector — the
    reference's infer() suppresses projector outputs anyway)."""
    import torch
    from _reference_oracle import import_reference_module
    hr = import_reference_module("models.HRNet")
    torch.manual_seed(1)
    graph = {"model": "HRNet", "backbone": "hrnet48", "align_corners": True,
             "pretrained": False, "dataset": "CITYSCAPES"}
    model = hr.HRNet(dict(graph), experiment=1)
    path = os.path.join(root, "chkpt_best.pt")
    torch.save({"model_state_dict": model.state_dict(), "epoch": 0,
                "global_step": 0, "best_miou": 0.0}, path)
    return path, graph


# --------------------------------------------------------------------- steps
def step_tree(ctx):
    """Dataset walkers find + decode records (tests/test_fake_trees.py is
    the fake-tree equivalent)."""
    from mscs_tpu.data import DATASET_REGISTRY, parse_transform_lists
    dcfg = ctx["config"]["data"]
    ds_cls = DATASET_REGISTRY[dcfg["dataset"]]
    tf = parse_transform_lists([], {}, dcfg["dataset"], dcfg["experiment"])
    counts = {}
    for split in ("train", "val"):
        ds = ds_cls(ctx["data_path"], tf, split=split,
                    experiment=dcfg["experiment"])
        assert len(ds) > 0, f"no records found for split '{split}'"
        img, lbl, _ = ds[0]          # decode check
        assert img.shape[:2] == lbl.shape
        counts[split] = len(ds)
    return counts


def step_convert(ctx):
    """ImageNet backbone checkpoint -> strict-shape graft
    (mscs_tpu/utils/pretrained.py; tests/test_pretrained.py)."""
    import jax
    import jax.numpy as jnp
    from mscs_tpu.config import graph_config
    from mscs_tpu.models import build_model
    from mscs_tpu.utils.pretrained import (load_pretrained_backbone,
                                           resolve_checkpoint_path)
    gcfg = graph_config(ctx["config"])
    gcfg["pretrained"] = True
    path = resolve_checkpoint_path(gcfg, ctx["data_path"])
    assert path, ("no ImageNet checkpoint found — place it at "
                  "<data_path>/pytorch_checkpoints/... (RUNBOOK.md step 2)")
    model = build_model(gcfg, ctx["config"]["data"]["experiment"])
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), x, train=False)
    out = load_pretrained_backbone(variables, gcfg,
                                   data_path=ctx["data_path"], required=True)
    ctx["pretrained_variables"] = out
    n = sum(p.size for p in jax.tree.leaves(out["params"]["backbone"]))
    return {"checkpoint": path, "backbone_params": int(n)}


def step_eval_parity(ctx):
    """N val images through OUR model from a converted reference seg
    checkpoint vs the IMPORTED reference model on torch CPU.  Tolerance:
    max softmax-prob diff <= 1e-3 and zero decisive argmax mismatches (the
    tests/test_tta_oracle.py standard)."""
    ref_ckpt = ctx.get("ref_checkpoint")
    if not ref_ckpt:
        return {"skipped": "no --ref-checkpoint given"}
    from _reference_oracle import import_reference_module, reference_available
    if not reference_available():
        return {"skipped": "reference repo not importable"}
    import jax
    import jax.numpy as jnp
    import torch
    from mscs_tpu.config import graph_config
    from mscs_tpu.data import DATASET_REGISTRY, parse_transform_lists
    from mscs_tpu.models import build_model
    from mscs_tpu.utils.torch_convert import convert_hrnet_seg

    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU oracle
    gcfg = ctx.get("ref_graph") or graph_config(ctx["config"])
    gcfg = dict(gcfg)
    gcfg.pop("pretrained", None)
    variant = gcfg.get("backbone", "hrnet48")
    if gcfg.get("model", "HRNet") != "HRNet" or \
            not variant.startswith("hrnet"):
        # trained-checkpoint eval-parity wraps the HRNet seg converter
        # (convert_hrnet_seg); the OCR/UPerNet heads have no trained-ckpt
        # converter (the reference published none to convert).  Their
        # loss/optimizer semantics are covered head-to-head by
        # tools/parity_train.py (PARITY.md upnswin row) and the ImageNet
        # BACKBONE converters ran in step_convert above.
        return {"skipped": f"no trained-seg converter for "
                           f"{gcfg.get('model')}/{variant}; covered by "
                           "tools/parity_train.py + step_convert"}

    ckpt = torch.load(ref_ckpt, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    ours_vars = convert_hrnet_seg(sd, gcfg, variant)

    hr = import_reference_module("models.HRNet")
    tg = {k: (dict(v) if isinstance(v, dict) else v) for k, v in gcfg.items()}
    tg.setdefault("dataset", ctx["config"]["data"]["dataset"])
    tg["pretrained"] = False  # weights come from the trained checkpoint
    ref_model = hr.HRNet(tg, experiment=ctx["config"]["data"]["experiment"])
    ref_model.load_state_dict({k.replace("module.", ""): v
                               for k, v in sd.items()})
    ref_model.eval()

    model = build_model(gcfg, ctx["config"]["data"]["experiment"])
    dcfg = ctx["config"]["data"]
    tf = parse_transform_lists(
        dcfg.get("transforms_val", ["torchvision_normalise"]),
        dcfg.get("transform_values_val", {}), dcfg["dataset"],
        dcfg["experiment"])
    ds = DATASET_REGISTRY[dcfg["dataset"]](ctx["data_path"], tf, split="val",
                                           experiment=dcfg["experiment"])
    n = min(ctx["records"], len(ds))
    max_diff, mismatches, total = 0.0, 0, 0
    for i in range(n):
        img, lbl, _ = ds[i]
        x = jnp.asarray(img)[None]
        got = model.apply({"params": ours_vars["params"],
                           "batch_stats": ours_vars["batch_stats"]},
                          x, train=False)
        got = got[0] if isinstance(got, tuple) else got
        got = np.asarray(jax.device_get(jax.nn.softmax(got, axis=-1)))[0]
        with torch.no_grad():
            tx = torch.from_numpy(np.asarray(img).transpose(2, 0, 1))[None]
            want = ref_model(tx)
            want = want[0] if isinstance(want, (list, tuple)) else want
            want = torch.softmax(want, dim=1)[0].numpy().transpose(1, 2, 0)
        max_diff = max(max_diff, float(np.abs(got - want).max()))
        ga, wa = got.argmax(-1), want.argmax(-1)
        diff = ga != wa
        # decisive = the top-2 prob margin exceeds the numeric tolerance
        margin = np.sort(want, axis=-1)
        decisive = (margin[..., -1] - margin[..., -2]) > 2e-3
        mismatches += int((diff & decisive).sum())
        total += diff.size
    assert max_diff <= 1e-3, f"max prob diff {max_diff:.2e} > 1e-3"
    assert mismatches == 0, f"{mismatches} decisive argmax mismatches"
    return {"records": n, "max_prob_diff": max_diff,
            "decisive_mismatches": mismatches, "pixels": total}


def step_validate(ctx):
    """Trainer.validate() over the val set: finite mIoU, post-processed
    resolution on PASCALC/ADE20K (tests/test_fake_trees.py::
    test_validate_postprocess_matches_infer)."""
    trainer = ctx["trainer"]()
    t0 = time.time()
    scalars = trainer.validate(0)
    trainer.close_loaders()
    assert np.isfinite(scalars["miou"])
    return {"miou": scalars["miou"], "val_loss": scalars["loss"],
            "seconds": round(time.time() - t0, 1)}


def step_short_train(ctx):
    """Debug-mode short train (3 batches/epoch like the reference's -debug,
    BaseManager truncation): loss finite, checkpoint written.  The
    statistical head-to-head lives in tools/parity_train.py --endpoint."""
    trainer = ctx["trainer"](debugging=True)
    metrics = trainer.train()
    assert np.isfinite(metrics["best_loss"])
    return {"best_loss": metrics["best_loss"],
            "best_miou": metrics["best_miou"]}


def step_tta_submit(ctx):
    """TTA inference + submission PNGs on <= N records (the reference's
    infer() with -tta -so; ours oracle-tested in tests/test_tta_oracle.py +
    test_fake_trees.py submission checks)."""
    trainer = ctx["trainer"](tta=True, save_outputs=True, debugging=True)
    result = trainer.infer()
    trainer.close_loaders()
    assert 0.0 <= result["miou"] <= 1.0
    pngs = sorted((trainer.log_dir / "outputs").glob("*/submit/*.png"))
    assert pngs, "no submission PNGs written"
    from PIL import Image
    vals = np.unique(np.array(Image.open(pngs[0])))
    return {"miou_tta": result["miou"], "submission_pngs": len(pngs),
            "id_range": [int(vals.min()), int(vals.max())]}


def step_full_recipe(ctx):
    """The full paper run — printed, never executed here."""
    cfgp = ctx["config_path"]
    cmd = (f"python main.py -c {cfgp} -u <user>   # full recipe\n"
           f"python main.py -c {cfgp} -u <user> -m inference -tta -so "
           f"-cpt <run_id>   # TTA eval + submission PNGs")
    print("  " + cmd.replace("\n", "\n  "))
    return {"command": cmd.split("\n")}


# ---------------------------------------------------------------------- main
def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--data-path", default=None)
    ap.add_argument("--config",
                    default="configs/CITYSCAPES/hrnet_contrastive_CTS.json")
    ap.add_argument("--ref-checkpoint", default=None,
                    help="trained reference chkpt_*.pt for eval-parity")
    ap.add_argument("--records", type=int, default=8)
    ap.add_argument("--steps", nargs="+", default=STEPS, choices=STEPS)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS",
                                                          ""))
    from mscs_tpu.config import parse_config
    config = parse_config(args.config, user="c", device=-1, dataset=-1,
                          parallel=False)
    dataset = config["data"]["dataset"]
    backbone = config["graph"].get("backbone", "hrnet48")

    tmp = None
    if args.dry_run:
        # dry-run is a machinery check, not a perf check: CPU + the smallest
        # backbone of the config's family (hrnet18 / swinT)
        os.environ["JAX_PLATFORMS"] = "cpu"
        tmp = tempfile.TemporaryDirectory(prefix="real_data_day_")
        args.data_path = tmp.name
        if dataset == "ADE20K":
            make_fake_ade20k(tmp.name)
        else:
            make_fake_cityscapes(tmp.name)
        small_backbone = ("hrnet18" if backbone.startswith("hrnet")
                          else "swinT")
        from _reference_oracle import reference_available
        if reference_available():
            make_fake_imagenet_ckpt(tmp.name, small_backbone)
    assert args.data_path, "--data-path required (or --dry-run)"

    config["data_path"] = args.data_path
    if args.dry_run:
        # shrink to walkable size; same config surface, tiny shapes
        config["graph"].update({"backbone": small_backbone})
        config["graph"].get("ms_projector", {}).update({"d": 16})
        # 64 keeps every out_stride-32 head shape valid (UPerNet PPM pools)
        crop = 48 if small_backbone.startswith("hrnet") else 64
        config["data"]["transform_values"]["crop_shape"] = [crop, crop]
        tvv = config["data"].get("transform_values_val", {})
        if "min_side_length" in tvv:
            # keep the resize_val/fit_stride protocol but at walkable size
            # (still exercises pw_ph_stride metadata + bucketed validate)
            tvv["min_side_length"] = crop
        config["data"]["batch_size"] = 2
        config["data"]["num_workers"] = 0
        config["loss"]["max_features_total"] = 256
        config["train"]["epochs"] = 1
        config["tta_scales"] = [0.5]
        config["tta_base_size"] = 64
        if dataset == "ADE20K":
            # exercise the Slide-protocol engine (ref TTAWrapperSlide
            # dispatch requires 'strides'; img_scale shrunk to walk size)
            config["strides"] = [crop // 2, crop // 2]
            # at the walk's single 0.5 scale this resizes to (2*crop, crop):
            # a 3x1 crop grid — the full slide machinery at test size
            config["tta_img_scale"] = [4 * crop, 2 * crop]
        config["compilation_cache_dir"] = ""

    log_dir = os.path.join(REPO, "logs")
    os.makedirs(log_dir, exist_ok=True)
    config.setdefault("log_path", os.path.join(log_dir, "real_data_day_runs"))

    def trainer(debugging=False, tta=False, save_outputs=False):
        from mscs_tpu.train.trainer import Trainer
        cfg = json.loads(json.dumps(config))
        cfg["debugging"] = debugging
        cfg["tta"] = tta
        cfg["save_outputs"] = save_outputs
        cfg["log_images"] = False
        if args.dry_run:
            cfg["graph"]["pretrained"] = False
        return Trainer(cfg)

    ctx = {"config": config, "config_path": args.config,
           "data_path": args.data_path, "records": args.records,
           "ref_checkpoint": args.ref_checkpoint, "trainer": trainer}
    if args.dry_run and not args.ref_checkpoint and \
            "eval_parity" in args.steps and \
            config["graph"].get("model", "HRNet") == "HRNet":
        from _reference_oracle import reference_available
        if reference_available():
            ctx["ref_checkpoint"], ctx["ref_graph"] = make_fake_trained_ckpt(
                args.data_path)

    results, failed = {}, None
    for name in STEPS:
        if name not in args.steps:
            continue
        fn = globals()[f"step_{name}"]
        print(f"[{name}] {fn.__doc__.splitlines()[0]}")
        t0 = time.time()
        try:
            out = fn(ctx)
            results[name] = {"ok": True, "seconds": round(time.time() - t0, 1),
                             **(out or {})}
            print(f"[{name}] PASS {json.dumps(out, default=str)}")
        except Exception as e:  # noqa: BLE001 — walker reports, then stops
            import traceback
            results[name] = {"ok": False, "error": repr(e)}
            print(f"[{name}] FAIL: {e!r}")
            traceback.print_exc()
            failed = name
            break

    # per-recipe summary files: real_data_day.json for the flagship CTS
    # config (back-compat), real_data_day_<name>.json otherwise
    stem = os.path.splitext(os.path.basename(args.config))[0]
    suffix = "" if stem == "hrnet_contrastive_CTS" else \
        "_" + stem.split("_")[0]
    out_path = os.path.join(log_dir, f"real_data_day{suffix}.json")
    with open(out_path, "w") as f:
        json.dump({"dry_run": args.dry_run, "config": args.config,
                   "results": results}, f, indent=2, default=str)
    print(f"summary -> {out_path}")
    if tmp:
        tmp.cleanup()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
