"""Trainer — config-driven orchestration (the managers layer, redesigned).

Replaces the reference's LoggingManager/BaseManager/per-model-Manager
inheritance stack (``managers/*.py``) with one Trainer: run-dir + seeding,
model/loss/data/optimizer construction from the same JSON config surface,
the epoch loop with per-term loss logging and train-metric tracking, rank-0
validation with best-mIoU checkpointing, resume, and info.json persistence.

Differences by design (TPU-first):
- one process drives the whole mesh (no mp.spawn; DDP -> sharded jit)
- train/eval steps are compiled once; data arrives via a prefetching host
  loader (workers -> device_put overlap)
- validation runs the same sharded step; full-image eval uses the padded
  canonical shapes produced by the val transforms.
"""
from __future__ import annotations

import datetime
import json
import pathlib
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mscs_tpu.config import graph_config, loss_config
from mscs_tpu.data import (
    DATASET_REGISTRY,
    DataLoader,
    DatasetFromDF,
    SyntheticDataset,
    get_cadis_dataframes,
    num_real_classes,
    parse_transform_lists,
)
from mscs_tpu.losses import LossWrapper
from mscs_tpu.models import build_model
from mscs_tpu.ops.metrics import mean_iou, pixel_accuracy
from mscs_tpu.ops.resize import resize_bilinear
from mscs_tpu.parallel import make_mesh, replicate
from mscs_tpu.train.checkpoint import CheckpointManager
from mscs_tpu.train.optim import build_optimizer
from mscs_tpu.train.schedules import convert_restarts_to_steps, make_lr_schedule
from mscs_tpu.train.state import (
    TrainState,
    make_eval_step,
    make_train_multistep,
    make_train_step,
    output_flags,
)
from mscs_tpu.utils.logger import Logger, ScalarWriter, printlog


def resolve_anchor_groups(per_replica_anchors, mesh_size: int) -> int | None:
    """Map ``loss.per_replica_anchors`` to a DCV2_ms ``anchor_groups`` count.

    ``true`` -> one group per mesh device (DDP semantics on THIS mesh);
    an integer -> that many groups regardless of device count (ADVICE r4:
    the paper's 4-GPU x bs-3 anchor pools on any mesh size); falsy -> None
    (single global pool)."""
    if not per_replica_anchors:
        return None
    if isinstance(per_replica_anchors, bool):
        return int(mesh_size)
    return int(per_replica_anchors)


class Trainer:
    def __init__(self, config: dict[str, Any]):
        self.config = config
        self.dataset = config["data"]["dataset"]
        self.experiment = config["data"]["experiment"]
        self.num_classes = num_real_classes(self.dataset, self.experiment)
        self.debugging = config.get("debugging", False)

        # run id / log dir (ref LoggingManager.__init__)
        run_id = config.get("run_id") or "{}_{}".format(
            datetime.datetime.now().strftime("%Y%m%d_%H%M%S"),
            config.get("name", "run"))
        self.run_id = run_id
        self.log_dir = pathlib.Path(config.get("log_path", "logs")) / run_id
        self.log_dir.mkdir(parents=True, exist_ok=True)
        Logger.init(self.log_dir)
        self.train_writer = ScalarWriter(self.log_dir, "train")
        self.valid_writer = ScalarWriter(self.log_dir, "valid")
        self.checkpoints = CheckpointManager(self.log_dir)

        # matmul precision: 'highest' (full fp32), 'high' (bf16 3-pass,
        # above A100-TF32 accuracy) or 'default' (1-pass bf16) — see
        # layers.set_matmul_precision
        from mscs_tpu.models.layers import (set_compute_dtype,
                                            set_matmul_precision)
        set_matmul_precision(config.get("train", {}).get("matmul_precision"))
        cdtype = config.get("train", {}).get("compute_dtype")
        if cdtype:
            set_compute_dtype(cdtype)
        # persistent XLA compile cache: HRNet-class programs take minutes to
        # compile; cache across processes unless explicitly disabled.
        # config 'compilation_cache_dir': unset -> libtpu-build-keyed
        # default; falsy -> disabled; a path -> that path.
        cache_dir = config.get("compilation_cache_dir", "__default__")
        if cache_dir:
            from mscs_tpu.utils.compile_cache import setup_compile_cache
            setup_compile_cache(None if cache_dir == "__default__"
                                else str(cache_dir))

        self.rng = jax.random.key(config.get("seed", 0))
        self.metrics: dict[str, Any] = {
            "best_miou": 0.0, "best_loss": float("inf"), "best_epoch": -1}

        self._build_data()
        # mesh over the largest device count that divides the global batch
        ndev = jax.device_count()
        n_use = max(d for d in range(1, ndev + 1) if self.batch_size % d == 0)
        if n_use != ndev:
            printlog(f"using {n_use}/{ndev} devices "
                     f"(batch {self.batch_size} not divisible by {ndev})")
        self.mesh = make_mesh(jax.devices()[:n_use])
        self._build_model_and_state()


    def _checkpoint_dir(self, spec):
        """Resolve ``-cpt`` values: True/None -> this run; a run-id or path ->
        that run's chkpts directory (ref BaseManager.py:76-82)."""
        if not isinstance(spec, str):
            return None
        resolved = self._checkpoint_dir_impl(spec)
        if resolved is None:
            raise FileNotFoundError(
                f"checkpoint spec '{spec}' does not resolve to a run: looked "
                f"for <spec>, <spec>/chkpts and "
                f"{self.config.get('log_path', 'logs')}/<spec>/chkpts")
        return resolved

    def _checkpoint_dir_impl(self, spec):
        p = pathlib.Path(spec)
        for cand in (p, p / "chkpts",
                     pathlib.Path(self.config.get("log_path", "logs")) / spec / "chkpts"):
            # only accept a directory that actually holds checkpoints
            if cand.is_dir() and any(
                    next(cand.glob(pat), None) is not None
                    for pat in ("best", "last", "epoch_*")):
                return cand
        return None

    # ------------------------------------------------------------------ data
    def _build_data(self) -> None:
        cfg = self.config
        dcfg = cfg["data"]
        tf_train = parse_transform_lists(
            dcfg.get("transforms", []), dcfg.get("transform_values", {}),
            self.dataset, self.experiment)
        tf_val = parse_transform_lists(
            dcfg.get("transforms_val", []), dcfg.get("transform_values_val", {}),
            self.dataset, self.experiment)

        data_path = cfg.get("data_path")
        synthetic = cfg.get("synthetic_data", False) or data_path is None
        # data.cache_decoded: true -> ~/.cache/mscs_tpu/decoded/<DATASET>,
        # or a directory path string (see data/cache.py)
        cache_cfg = dcfg.get("cache_decoded")
        if cache_cfg:
            from mscs_tpu.data.cache import default_cache_dir
            cache_dir = (cache_cfg if isinstance(cache_cfg, str)
                         else default_cache_dir(self.dataset))
        else:
            cache_dir = None
        # submission outputs are named by the source filename
        # (ref BaseManager.save_output :677-699 uses metadata filenames)
        return_fn = bool(cfg.get("save_outputs")
                         or cfg.get("mode") == "inference")
        if synthetic:
            hw = dcfg.get("transform_values", {}).get("crop_shape", [512, 512])
            n_train = 8 if self.debugging else dcfg.get("synthetic_length", 64)
            self.train_set = SyntheticDataset(self.dataset, self.experiment,
                                              tf_train, length=n_train, hw=hw)
            # always the deterministic val transforms: falling back to the
            # random train pipeline made validate() non-repeatable (and
            # infer() disagree with the last validate on identical params)
            self.valid_set = SyntheticDataset(self.dataset, self.experiment,
                                              tf_val, length=4, hw=hw, seed=1,
                                              return_filename=return_fn)
        elif self.dataset == "CADIS":
            # config 'cadis_csv' overrides the shipped metadata table
            # (ref reads data/data.csv|pkl, datasets/CaDIS.py:20-30)
            train_df, valid_df = get_cadis_dataframes(
                cfg, cfg.get("cadis_csv", "data/data.csv"))
            self.train_set = DatasetFromDF(train_df, data_path, tf_train,
                                           self.experiment,
                                           decoded_cache_dir=cache_dir)
            self.valid_set = DatasetFromDF(valid_df, data_path, tf_val,
                                           self.experiment,
                                           return_filename=return_fn,
                                           decoded_cache_dir=cache_dir)
            self._train_df = train_df
        else:
            ds_cls = DATASET_REGISTRY[self.dataset]
            split = dcfg.get("split", "train")
            # debug mode trains on val/val (ref BaseManager.py:280-283)
            train_split = "val" if self.debugging else split
            self.train_set = ds_cls(data_path, tf_train, split=train_split,
                                    experiment=self.experiment,
                                    decoded_cache_dir=cache_dir)
            self.valid_set = ds_cls(data_path, tf_val, split="val",
                                    experiment=self.experiment,
                                    return_filename=return_fn,
                                    decoded_cache_dir=cache_dir)

        self.batch_size = dcfg.get("batch_size", 8)
        worker_type = dcfg.get("worker_type", "thread")
        from mscs_tpu.data.grain_loader import build_loader
        backend = dcfg.get("loader_backend", "native")
        self.train_loader = build_loader(
            backend,
            self.train_set, self.batch_size, shuffle=True, drop_last=True,
            num_workers=dcfg.get("num_workers", 4), seed=cfg.get("seed", 0),
            worker_type=worker_type)
        # repeat-factor epoch schedule (ref BaseManager.load_data :217-244;
        # CaDIS recipes oversample rare-class frames between two epochs)
        self.rf_loader = None
        rf_range = dcfg.get("repeat_factor", [0, 0])
        self.rf_epochs = range(0)
        if self.dataset == "CADIS" and len(rf_range) >= 1 and rf_range[0:2] != [0, 0]:
            if len(rf_range) == 1:
                rf_range = [rf_range[0], cfg["train"]["epochs"]]
            from mscs_tpu.data.sampler import cadis_repeat_factors
            rfs = cadis_repeat_factors(
                self._train_df, self.experiment,
                dcfg.get("repeat_factor_freq_thresh", 0.15))
            self.rf_loader = build_loader(
                backend,
                self.train_set, self.batch_size, shuffle=True, drop_last=True,
                num_workers=dcfg.get("num_workers", 4),
                seed=cfg.get("seed", 0), repeat_factors=rfs,
                worker_type=worker_type)
            self.rf_epochs = range(int(rf_range[0]), int(rf_range[1]))
        vb = cfg.get("valid_batch_size", 1)
        self.valid_loader = build_loader(
            backend,
            self.valid_set, vb, shuffle=False, drop_last=False,
            num_workers=dcfg.get("num_workers", 4),
            worker_type=worker_type)

    # ----------------------------------------------------------------- model
    def _build_model_and_state(self) -> None:
        cfg = self.config
        gcfg = graph_config(cfg)
        self.model = build_model(gcfg, self.experiment)
        lw_cfg = loss_config(cfg)
        # opt-in exact-DDP contrastive semantics: per-device anchor pools
        # (see DenseContrastiveLossV2_ms.anchor_groups).  ``true`` groups by
        # the current mesh size; an explicit integer pins the group count
        # independent of the device count (ADVICE r4: paper parity means 4
        # groups x bs 3 regardless of how many chips run the step).
        groups = resolve_anchor_groups(lw_cfg.get("per_replica_anchors"),
                                       self.mesh.devices.size)
        if groups is not None:
            lw_cfg["anchor_groups"] = groups
        self.loss_wrapper = LossWrapper.from_config(lw_cfg)
        self.has_interm, self.has_proj = output_flags(gcfg)

        crop = cfg["data"].get("transform_values", {}).get(
            "crop_shape", [512, 512])
        sample = jnp.zeros((1, int(crop[0]), int(crop[1]), 3), jnp.float32)
        variables = jax.jit(self.model.init, static_argnames=("train",))(
            jax.random.key(cfg.get("seed", 0)), sample, train=False)

        # ImageNet init (ref loads it in the model constructors,
        # models/HRNet.py:657-684 / Swin.py:674-716; skipped when resuming a
        # checkpoint exactly like ref BaseManager.py:54)
        if gcfg.get("pretrained") and not cfg.get("load_checkpoint"):
            from mscs_tpu.utils.pretrained import load_pretrained_backbone
            variables = load_pretrained_backbone(
                variables, gcfg, data_path=cfg.get("data_path"),
                required=not cfg.get("synthetic_data", False))

        epochs = cfg["train"]["epochs"]
        bpe = max(len(self.train_loader), 1)
        if cfg["train"].get("lr_batchwise", False):
            total = epochs * bpe
            restarts = convert_restarts_to_steps(
                cfg["train"].get("lr_restarts", []), [bpe] * epochs)
        else:
            total = epochs
            restarts = list(cfg["train"].get("lr_restarts", []))
        self.lr_schedule = make_lr_schedule(cfg["train"], restarts, total)
        self.lr_batchwise = cfg["train"].get("lr_batchwise", False)
        tx = build_optimizer(cfg["train"], self.lr_schedule,
                             variables["params"])
        state = TrainState.create(
            apply_fn=self.model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}), tx=tx)
        self.state = replicate(self.mesh, state)

        step_fn = make_train_step(
            self.loss_wrapper, self.num_classes,
            has_interm=self.has_interm, has_proj=self.has_proj)
        self.train_step = jax.jit(step_fn, donate_argnums=(0,))
        # train.steps_per_call > 1: scan K optimizer steps per host dispatch
        # (amortised dispatch; per-step logs become K-window aggregates).
        # Debug mode keeps K=1 — its 3-batch truncation and per-batch logs
        # mirror the reference (HRNet_Manager.py:113-114).
        self.steps_per_call = (1 if self.debugging else
                               int(cfg["train"].get("steps_per_call", 1)))
        self.train_multistep = (
            jax.jit(make_train_multistep(step_fn), donate_argnums=(0,))
            if self.steps_per_call > 1 else None)
        # eval + validation loss (for best_loss, ref valid_logging :213-291).
        # Validation runs ungrouped: per_replica_anchors mirrors DDP's
        # per-replica TRAIN pools, but the reference validates rank-0
        # single-process (HRNet_Manager.py:148-156) and the valid batch
        # (default 1) need not divide the device count.
        val_lw_cfg = {k: v for k, v in lw_cfg.items() if k != "anchor_groups"}
        self.val_step = jax.jit(make_eval_step(
            self.num_classes, has_interm=self.has_interm,
            has_proj=self.has_proj,
            loss_wrapper=LossWrapper.from_config(val_lw_cfg)))
        self.start_epoch = 0

        if cfg.get("load_checkpoint"):
            which = "last" if cfg.get("load_last") else "best"
            from_dir = self._checkpoint_dir(cfg["load_checkpoint"])
            self.state, meta = self.checkpoints.load(self.state, which,
                                                     from_dir=from_dir)
            self.start_epoch = meta["epoch"] + 1
            self.metrics["best_miou"] = meta.get("best_miou", 0.0)
            printlog(f"resumed from {which} checkpoint at epoch {meta['epoch']}")

    # ----------------------------------------------------------------- loops
    def train_one_epoch(self, epoch: int) -> dict[str, float]:
        loader = (self.rf_loader if (self.rf_loader is not None
                                     and epoch in self.rf_epochs)
                  else self.train_loader)
        loader.set_epoch(epoch)
        n_batches = len(loader)
        limit = 3 if self.debugging else n_batches  # ref debug truncation
        accum: dict[str, float] = {}
        cm = np.zeros((self.num_classes, self.num_classes), np.int64)
        seen = 0
        profile_steps = self.config.get("profile_steps", 0)
        t0 = time.time()
        from mscs_tpu.data.loader import device_prefetch
        group = self.steps_per_call
        prefetched = device_prefetch(loader, self.mesh, size=2, group=group)
        first_weight = 0
        for i, device_batch in enumerate(prefetched):
            if i >= limit:
                break
            if epoch == self.start_epoch and profile_steps:
                # jax.profiler trace of the first steps (the reference only
                # had wall-clock prints — SURVEY.md §5)
                if i == 1:
                    jax.profiler.start_trace(str(self.log_dir / "profile"))
                if i == 1 + profile_steps:
                    jax.profiler.stop_trace()
            device_batch.pop("metadata", None)
            weight = device_batch.pop("_steps", 1)
            if i == 0 and self.config.get("log_images", True):
                # pre-update [img|lbl|pred] panel from the epoch's first
                # record (ref train_logging writes train_images/record_00
                # at batch 0 of every epoch, LoggingManager.py:163-170)
                self._write_train_panel(device_batch, epoch,
                                        grouped=group > 1)
            if group > 1 and weight == group:
                results = [(self._run_step(self.train_multistep,
                                           device_batch, epoch), weight)]
            elif group > 1:
                # trailing partial group: unstack the short step axis and
                # reuse the single-step program — avoids compiling a second
                # scan length for the epoch tail
                results = [(self._run_step(
                    self.train_step,
                    {k: v[s] for k, v in device_batch.items()}, epoch), 1)
                    for s in range(weight)]
            else:
                results = [(self._run_step(self.train_step, device_batch,
                                           epoch), 1)]
            for logs, w in results:
                for k, v in logs.items():
                    if k == "confusion":
                        cm += np.asarray(jax.device_get(v), np.int64)
                    else:
                        # multistep returns window means; w restores sums
                        accum[k] = (accum.get(k, 0.0)
                                    + float(jax.device_get(v)) * w)
            seen += weight
            if i == 0:
                first_weight = weight
                t0 = time.time()  # exclude the compile call from throughput
        dt = time.time() - t0
        scalars = {k: v / max(seen, 1) for k, v in accum.items()}
        scalars["lr"] = float(self.lr_schedule(
            int(jax.device_get(self.state.step)) - 1 if self.lr_batchwise
            else epoch))
        # the first dispatch (compile) is excluded from the window, so
        # `seen - first_weight` steps were timed; report 0 for epochs that
        # fit in one dispatch instead of a fake number
        timed = max(seen - first_weight, 0)
        scalars["images_per_sec"] = (timed * self.batch_size / max(dt, 1e-9)
                                     if timed else 0.0)
        miou = mean_iou(jnp.asarray(cm), self.dataset, self.experiment)
        scalars["train_miou"] = miou["mean_iou"]
        self.train_writer.add_scalars(int(jax.device_get(self.state.step)),
                                      scalars)
        printlog(f"epoch {epoch:03d} train: " + ", ".join(
            f"{k}={v:.4f}" for k, v in scalars.items()))
        return scalars

    def _write_train_panel(self, device_batch, epoch: int,
                           grouped: bool) -> None:
        """One [img | lbl | pred] panel from the first train record of the
        epoch, computed on the pre-update params like the reference's
        batch-0 ``train_images/record_00`` panel."""
        from mscs_tpu.utils.viz import to_comb_image
        from PIL import Image as PILImage
        img = device_batch["image"]
        lbl = device_batch["label"]
        if grouped:  # (K, N, ...) scanned-multistep layout
            img, lbl = img[0], lbl[0]
        one = {"image": img[0:1], "label": lbl[0:1]}
        logits, _, _ = self.val_step(self.state, one,
                                     jax.random.fold_in(self.rng, 104729),
                                     epoch)
        pred = np.asarray(jax.device_get(jnp.argmax(logits[0], axis=-1)))
        viz_dir = self.log_dir / "viz"
        viz_dir.mkdir(exist_ok=True)
        panel = to_comb_image(np.asarray(jax.device_get(img[0])),
                              np.asarray(jax.device_get(lbl[0])), pred,
                              self.dataset, self.experiment)
        PILImage.fromarray(panel).save(
            viz_dir / f"train_e{epoch:03d}_panel.png")

    def _run_step(self, step_fn, device_batch, epoch):
        """Advance ``self.state`` through one compiled dispatch; return logs."""
        self.state, logs = step_fn(self.state, device_batch, self.rng, epoch)
        return logs

    def _pad_to_bucket(self, image: np.ndarray, label: np.ndarray):
        """Pad (N,H,W,C) image / (N,H,W) label up to the next multiple of
        ``valid_shape_bucket`` so variable-shaped val sets (PascalC/ADE20K
        min-side resize) hit a handful of jit compiles instead of one per
        distinct shape.  Padded pixels carry the ignore id, so the confusion
        matrix and every ignore-aware loss term exclude them exactly.
        Returns (image, label, (orig_h, orig_w))."""
        bucket = self.config.get(
            "valid_shape_bucket",
            128 if self.dataset in ("PASCALC", "ADE20K") else 0)
        h, w = image.shape[1:3]
        if not bucket:
            return image, label, (h, w)
        ph = (-h) % bucket
        pw = (-w) % bucket
        if ph or pw:
            image = np.pad(image, ((0, 0), (0, ph), (0, pw), (0, 0)))
            label = np.pad(label, ((0, 0), (0, ph), (0, pw)),
                           constant_values=self.num_classes)
        return image, label, (h, w)

    def validate(self, epoch: int) -> dict[str, float]:
        from mscs_tpu.ops.metrics import confusion_matrix_np

        cm = np.zeros((self.num_classes, self.num_classes), np.int64)
        n_records = len(self.valid_loader)
        limit = 3 if self.debugging else n_records
        loss_sum, n_batches = 0.0, 0
        # evenly-spaced panel records over the val set
        # (ref HRNet_Manager.py:189-196 linspaces max_valid_imgs records)
        n_panels = int(self.config.get("max_valid_imgs", 10))
        panel_recs = (set(np.round(np.linspace(
            0, max(n_records - 1, 0), n_panels)).astype(int))
            if n_panels > 0 and self.config.get("log_images", True) else set())
        panels: list[tuple[int, np.ndarray, np.ndarray, np.ndarray]] = []
        for i, batch in enumerate(self.valid_loader):
            if i >= limit:
                break
            image, label, (oh, ow) = self._pad_to_bucket(
                np.asarray(batch["image"]), np.asarray(batch["label"]))
            device_batch = {
                "image": jnp.asarray(image),
                "label": jnp.asarray(label)}
            logits, cm_b, loss_b = self.val_step(
                self.state, device_batch,
                jax.random.fold_in(self.rng, 7919 + i), epoch)
            loss_sum += float(jax.device_get(loss_b))
            n_batches += 1
            # The reference applies post_process_output BEFORE the epoch-val
            # confusion matrix (HRNet_Manager.py:183-185): un-pad, un-resize,
            # evaluate vs original labels.  Best-mIoU checkpoint selection on
            # PASCALC/ADE20K therefore happens at original label resolution;
            # match that here (loss stays at network resolution like the
            # reference's forward_step).  Other datasets keep the on-device
            # shape-bucket fast path.
            meta = (batch["metadata"][0] if batch.get("metadata") else None)
            post = (meta is not None and image.shape[0] == 1
                    and self.dataset in ("PASCALC", "ADE20K"))
            if (meta is not None and image.shape[0] > 1
                    and self.dataset in ("PASCALC", "ADE20K")
                    and not getattr(self, "_warned_post_bs", False)):
                # ADVICE r4: without this warning a valid_batch_size > 1
                # config silently reverts best-mIoU selection to
                # network/bucket resolution — a quiet semantic divergence
                # from the reference (which always validates at bs 1).
                self._warned_post_bs = True
                printlog(
                    f"WARNING: {self.dataset} original-resolution validation "
                    f"requires valid_batch_size=1 (got {image.shape[0]}); "
                    "epoch mIoU is computed at network resolution")
            if post:
                logits_np = np.asarray(jax.device_get(logits))[:, :oh, :ow]
                logits_np, label_np = self.post_process_output(
                    logits_np, np.asarray(batch["label"]), meta)
                cm += confusion_matrix_np(logits_np, np.asarray(label_np),
                                          self.num_classes)
            else:
                cm += np.asarray(jax.device_get(cm_b), np.int64)
            if i in panel_recs and len(panels) < n_panels:
                if post:
                    # panel at original resolution like the reference
                    # (HRNet_Manager.py:69-77 resizes img back too; nearest
                    # here — the image is eyeball-only)
                    lbl0 = np.asarray(label_np[0])
                    pred0 = np.argmax(logits_np[0], axis=-1)
                    img0 = np.asarray(
                        jax.device_get(device_batch["image"][0]))[:oh, :ow]
                    ys = np.linspace(0, oh - 1, lbl0.shape[0]).round().astype(int)
                    xs = np.linspace(0, ow - 1, lbl0.shape[1]).round().astype(int)
                    img0 = img0[ys][:, xs]
                else:
                    img0 = np.asarray(
                        jax.device_get(device_batch["image"][0]))[:oh, :ow]
                    lbl0 = np.asarray(batch["label"][0])
                    pred0 = np.asarray(jax.device_get(
                        jnp.argmax(logits[0], axis=-1)))[:oh, :ow]
                panels.append((i, img0, lbl0, pred0))
        mious = mean_iou(jnp.asarray(cm), self.dataset, self.experiment,
                         categories=True)
        pa, pac = pixel_accuracy(jnp.asarray(cm))
        val_loss = loss_sum / max(n_batches, 1)
        scalars = {"miou": mious["mean_iou"], "loss": val_loss,
                   "pixel_acc": float(pa),
                   "pixel_acc_per_class": float(pac)}
        for cat, v in mious.get("categories", {}).items():
            scalars[f"miou_{cat}"] = v
        self.valid_writer.add_scalars(int(jax.device_get(self.state.step)),
                                      scalars)
        printlog(f"epoch {epoch:03d} valid: " + ", ".join(
            f"{k}={v:.4f}" for k, v in scalars.items()))

        # image panel + confusion-matrix heatmap per validation
        # (ref LoggingManager.py:163-170, 224-231 write these to TensorBoard)
        if self.config.get("log_images", True):
            from mscs_tpu.utils.viz import (confusion_matrix_figure,
                                            to_comb_image)
            from PIL import Image as PILImage
            viz_dir = self.log_dir / "viz"
            viz_dir.mkdir(exist_ok=True)
            for rec, img0, lbl0, pred0 in panels:
                img = to_comb_image(img0, lbl0, pred0,
                                    self.dataset, self.experiment)
                PILImage.fromarray(img).save(
                    viz_dir / f"valid_e{epoch:03d}_panel_r{rec:04d}.png")
            confusion_matrix_figure(cm, self.dataset, self.experiment,
                                    viz_dir / f"valid_e{epoch:03d}_cm.png")

        # best tracking + checkpointing (ref valid_logging :213-291)
        self._last_val_loss = val_loss
        self.metrics["best_loss"] = min(self.metrics.get("best_loss",
                                                         float("inf")),
                                        val_loss)
        if scalars["miou"] > self.metrics["best_miou"]:
            self.metrics["best_miou"] = scalars["miou"]
            self.metrics["best_epoch"] = epoch
            self.checkpoints.save(self.state, epoch,
                                  self.metrics["best_miou"], val_loss,
                                  is_best=True)
        if (epoch + 1) % self.config.get("log_every_n_epochs", 100) == 0:
            self.checkpoints.save(self.state, epoch,
                                  self.metrics["best_miou"], val_loss)
        self.write_info_json()
        return scalars

    def train(self) -> dict[str, Any]:
        cfg = self.config
        epochs = 1 if self.debugging else cfg["train"]["epochs"]
        valid_freq = cfg.get("valid_freq", 10)
        try:
            for epoch in range(self.start_epoch, epochs):
                # densify validation near the end (ref BaseManager.py:151-154)
                vf = 1 if epoch >= 0.9 * epochs else valid_freq
                self.train_one_epoch(epoch)
                if (epoch + 1) % vf == 0 or epoch == epochs - 1:
                    self.validate(epoch)
            self.checkpoints.save(self.state, epochs - 1,
                                  self.metrics["best_miou"],
                                  getattr(self, "_last_val_loss", 0.0),
                                  tag="last")
            self.write_info_json()
        finally:
            self.close_loaders()
        return self.metrics

    def close_loaders(self) -> None:
        """Shut down loader worker pools (the process-pool variant would
        otherwise leak workers across multi-run processes, ADVICE r2)."""
        for name in ("train_loader", "rf_loader", "valid_loader"):
            loader = getattr(self, name, None)
            if loader is not None:
                loader.close()

    # ------------------------------------------------------------- inference
    def post_process_output(self, logits: np.ndarray, label: np.ndarray,
                            metadata: dict | None):
        """Undo val-resize/pad via metadata (ref HRNet_Manager.py:56-80):
        strip fit-stride padding, resize logits back to the pre-resize shape,
        and evaluate against the original labels when provided.  Applied for
        PASCALC/ADE20K only, exactly as upstream gates it (:57) — a
        CITYSCAPES/CADIS run with resize_val metadata evaluates at the
        resized/padded resolution like the reference does."""
        if not metadata or self.config["data"]["dataset"] not in (
                "PASCALC", "ADE20K"):
            return logits, label
        if "pw_ph_stride" in metadata:
            pw, ph, stride = metadata["pw_ph_stride"]
            # the reference crops the LABEL alongside the logits
            # (HRNet_Manager.py:62-64); without it a 'resize' val pipeline
            # (pw_ph_stride set, original_labels absent) hands mismatched
            # shapes to the confusion matrix (ADVICE r4)
            if pw > 0:
                logits = logits[:, :, :logits.shape[2] - pw]
                if label.shape[-1] == logits.shape[2] + pw:
                    label = label[..., :label.shape[-1] - pw]
            if ph > 0:
                logits = logits[:, :logits.shape[1] - ph]
                if label.shape[-2] == logits.shape[1] + ph:
                    label = label[..., :label.shape[-2] - ph, :]
        if "original_labels" in metadata:
            orig = np.asarray(metadata["original_labels"])
            logits = np.asarray(jax.device_get(resize_bilinear(
                jnp.asarray(logits), orig.shape[-2:],
                align_corners=self.config["graph"].get("align_corners", True))))
            label = orig[None] if orig.ndim == 2 else orig
        return logits, label

    def infer(self) -> dict[str, float]:
        """TTA evaluation (ref BaseManager.infer :585-675)."""
        from mscs_tpu.models.tta import build_tta
        from mscs_tpu.ops.metrics import confusion_matrix_np
        from mscs_tpu.train.state import split_outputs

        if self.config.get("load_checkpoint"):
            which = "last" if self.config.get("load_last") else "best"
            from_dir = self._checkpoint_dir(self.config["load_checkpoint"])
            self.state, _ = self.checkpoints.load(self.state, which,
                                                  from_dir=from_dir)

        state = self.state

        # params are ARGUMENTS, not closures: closed-over weights embed as
        # HLO constants (hundreds of MB for W48) and can overflow
        # remote-compile transport limits
        @jax.jit
        def apply_vars(variables, image):
            outputs = state.apply_fn(variables, image, train=False)
            logits, _, _ = split_outputs(outputs, self.has_interm,
                                         self.has_proj)
            return logits

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        apply_jit = lambda image: apply_vars(variables, image)

        use_tta = self.config.get("tta", False)
        tta = build_tta(apply_jit, self.config, self.num_classes,
                        mesh=self.mesh) \
            if use_tta else None
        cm = np.zeros((self.num_classes, self.num_classes), np.int64)
        limit = (10 if self.debugging else len(self.valid_loader))
        submit_dir = debug_dir = None
        if self.config.get("save_outputs"):
            # ref layout: outputs/{split}/submit (id-remapped submission
            # PNGs) + outputs/{split}/debug (colormap visualisations), named
            # by the source filename (ref BaseManager.save_output :677-699)
            split = self.config["data"].get("split", "val")
            split = split[-1] if isinstance(split, list) else split
            submit_dir = self.log_dir / "outputs" / str(split) / "submit"
            debug_dir = self.log_dir / "outputs" / str(split) / "debug"
            submit_dir.mkdir(parents=True, exist_ok=True)
            debug_dir.mkdir(parents=True, exist_ok=True)
        for i, batch in enumerate(self.valid_loader):
            if i >= limit:
                break
            if tta:
                logits = tta(jnp.asarray(batch["image"]))
            else:
                image, _, (oh, ow) = self._pad_to_bucket(
                    np.asarray(batch["image"]), np.asarray(batch["label"]))
                logits = apply_jit(jnp.asarray(image))[:, :oh, :ow]
            logits = np.asarray(jax.device_get(logits))
            meta = (batch["metadata"][0] if batch.get("metadata") else None)
            logits, label = self.post_process_output(
                logits, np.asarray(batch["label"]), meta)
            # host bincount: post-processed records have per-record original
            # shapes — a jitted cm would recompile per distinct shape
            cm += confusion_matrix_np(np.asarray(logits), np.asarray(label),
                                      self.num_classes)
            if submit_dir is not None:
                from PIL import Image as PILImage
                from mscs_tpu.utils.viz import (mask_to_colormap,
                                                save_submission_png)
                stem = (pathlib.Path(meta["filename"]).stem
                        if meta and meta.get("filename") else f"{i:06d}")
                pred = np.argmax(logits[0], axis=-1)
                save_submission_png(pred, submit_dir / f"{stem}.png",
                                    self.dataset, self.experiment)
                PILImage.fromarray(
                    mask_to_colormap(pred, self.dataset, self.experiment)
                ).save(debug_dir / f"{stem}.png")
        mious = mean_iou(jnp.asarray(cm), self.dataset, self.experiment,
                         categories=True)
        result = {"miou": mious["mean_iou"]}
        result.update({f"miou_{k}": v
                       for k, v in mious.get("categories", {}).items()})
        out_name = datetime.datetime.now().strftime("%Y%m%d") + (
            "_infer_tta.json" if use_tta else "_infer.json")
        with open(self.log_dir / out_name, "w") as f:
            json.dump(result, f, indent=2)
        printlog(f"inference: {result}")
        return result

    def demo_tsne(self) -> None:
        """t-SNE scatter of per-class projector features
        (ref BaseManager.demo_tsne :701-783)."""
        from mscs_tpu.train.state import split_outputs
        from mscs_tpu.utils.tsne import TsneManager

        if self.config.get("load_checkpoint"):
            which = "last" if self.config.get("load_last") else "best"
            from_dir = self._checkpoint_dir(self.config["load_checkpoint"])
            self.state, _ = self.checkpoints.load(self.state, which,
                                                  from_dir=from_dir)
        scale = self.config.get("tsne_scale", 32) or 32
        mgr = TsneManager(self.dataset, self.experiment, scale=scale)
        state = self.state
        # Reference semantics: t-SNE runs on BACKBONE stage features (the
        # model's return_features=True path), selecting the stage whose
        # stride matches tsne_scale (ref BaseManager.py:713-717, 731-757).
        # HRNet/UPerNet support it here; other models fall back to projector
        # features (the reference raises NotImplementedError for those).
        model_name = self.config["graph"].get("model", "")
        backbone_feats = model_name in ("HRNet", "UPerNet")
        stage_idx = {4: 0, 8: 1, 16: 2, 32: 3}.get(scale, 3)

        @jax.jit
        def feats_vars(variables, image):
            if backbone_feats:
                _, feats = state.apply_fn(variables, image, train=False,
                                          return_features=True)
                return feats[stage_idx]
            outputs = state.apply_fn(variables, image, train=False)
            _, _, feats = split_outputs(outputs, self.has_interm,
                                        self.has_proj)
            if isinstance(feats, (list, tuple)):
                # pick the scale closest to the requested stride
                strides = [image.shape[1] // f.shape[1] for f in feats]
                feats = feats[int(np.argmin([abs(s - scale) for s in strides]))]
            return feats

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        feats_fn = lambda image: feats_vars(variables, image)

        limit = 10 if self.debugging else len(self.valid_loader)
        for i, batch in enumerate(self.valid_loader):
            if i >= limit:
                break
            feats = feats_fn(jnp.asarray(batch["image"]))
            mgr.accumulate(feats, jnp.asarray(batch["label"]))
        out = self.log_dir / f"tsne_scale{scale}.png"
        mgr.compute_and_plot(out)
        printlog(f"t-SNE written to {out}")

    def run_diagnostic(self, n_images: int = 4) -> None:
        """Render dominant-class-vs-label panels to eyeball the loss's label
        downsampling (ref LoggingManager.run_diagnostic :456-523)."""
        from mscs_tpu.ops.resize import downsample_labels_nearest
        from mscs_tpu.utils.viz import mask_to_colormap
        from PIL import Image as PILImage

        out_dir = self.log_dir / "diagnostics"
        out_dir.mkdir(exist_ok=True)
        for i, batch in enumerate(self.valid_loader):
            if i >= n_images:
                break
            lbl = jnp.asarray(batch["label"])
            panels = [mask_to_colormap(np.asarray(lbl[0]), self.dataset,
                                       self.experiment)]
            for s in (4, 8, 16, 32):
                down = np.asarray(downsample_labels_nearest(lbl, s))[0]
                up = np.kron(down, np.ones((s, s), np.int32))
                up = up[:lbl.shape[1], :lbl.shape[2]]
                pad = ((0, lbl.shape[1] - up.shape[0]),
                       (0, lbl.shape[2] - up.shape[1]))
                if any(p[1] > 0 for p in pad):
                    up = np.pad(up, pad, mode="edge")
                panels.append(mask_to_colormap(up, self.dataset,
                                               self.experiment))
            img = np.concatenate(panels, axis=1)
            PILImage.fromarray(img).save(out_dir / f"diag_{i:03d}.png")
        printlog(f"diagnostics written to {out_dir}")

    def write_info_json(self) -> None:
        """Crash-resilient metrics persistence (ref :414-433)."""
        info = {"config": _jsonable(self.config), "metrics": self.metrics,
                "run_id": self.run_id}
        with open(self.log_dir / "info.json", "w") as f:
            json.dump(info, f, indent=2, default=str)


def _jsonable(obj):
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (pathlib.Path,)):
        return str(obj)
    return obj
