"""CLI entry — same argument surface as the reference ``main.py``.

python main.py -c configs/CITYSCAPES/hrnet_contrastive_CTS.json -u c \
    [-bs N] [-ep E] [-w K] [-m mode] [-l ce|ms|ms_cs] [-tta] [-debug]

TPU notes: ``-d/--device`` and ``-p/--parallel`` are accepted for CLI parity
but device placement is automatic — one process drives every visible chip
through the data mesh; multi-host runs use --coordinator/--num-processes.
"""
from __future__ import annotations

import argparse
import os

import jax

from mscs_tpu.config import apply_loss_preset, parse_config
from mscs_tpu.utils.logger import printlog

# Honor JAX_PLATFORMS even when a hardware device plugin would override the
# env var (the tunneled-TPU plugin does): `JAX_PLATFORMS=cpu python main.py
# ...` must actually run on CPU (tests/conftest.py uses the same technique).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", type=str, required=True)
    p.add_argument("-u", "--user", type=str, default="c")
    p.add_argument("-d", "--device", nargs="+", type=int, default=-1)
    p.add_argument("-s", "--dataset", type=str, default=-1, required=False)
    p.add_argument("-p", "--parallel", action="store_true")
    p.add_argument("-debug", "--debugging", action="store_true")
    p.add_argument("-vf", "--valid_freq", type=int, default=None)
    p.add_argument("-w", "--workers", type=int, default=None)
    p.add_argument("-m", "--mode", type=str, default=None)
    p.add_argument("-cpt", "--checkpoint", type=str, default=None)
    p.add_argument("-bs", "--batch_size", type=int, default=None)
    p.add_argument("-ep", "--epochs", type=int, default=None)
    p.add_argument("-so", "--save_outputs", action="store_true")
    p.add_argument("-rfv", "--run_final_val", action="store_true")
    p.add_argument("-tta", "--tta", action="store_true")
    p.add_argument("-l", "--loss", choices=[None, "ce", "ms", "ms_cs"],
                   default=None)
    p.add_argument("--synthetic-data", action="store_true",
                   help="train on synthetic data (no dataset on disk needed)")
    p.add_argument("--coordinator", type=str, default=None,
                   help="multi-host coordinator address host:port")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def main() -> None:
    args = build_argparser().parse_args()
    config = parse_config(args.config, args.user, args.device, args.dataset,
                          args.parallel)
    config = apply_loss_preset(config, args.loss)
    if args.batch_size is not None:
        config["data"]["batch_size"] = args.batch_size
    if args.epochs is not None:
        config["train"]["epochs"] = args.epochs
    if args.workers is not None:
        config["data"]["num_workers"] = args.workers
    if args.valid_freq is not None:
        config["valid_freq"] = args.valid_freq
    if args.mode is not None:
        config["mode"] = args.mode
    if args.checkpoint is not None:
        config["load_checkpoint"] = args.checkpoint
    if args.tta:
        config["tta"] = True
    if args.save_outputs:
        config["save_outputs"] = True
    if args.run_final_val:
        config["run_final_val"] = True
    if args.debugging:
        config["debugging"] = True
    if args.synthetic_data:
        config["synthetic_data"] = True

    if args.num_processes:
        from mscs_tpu.parallel import initialize_distributed
        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)

    mode = config.get("mode", "training")
    valid_modes = ("training", "inference", "submission_inference",
                   "demo_tsne", "diagnostics")
    if mode not in valid_modes:
        raise SystemExit(f"mode '{mode}' not supported (choose from {valid_modes})")

    from mscs_tpu.train.trainer import Trainer
    trainer = Trainer(config)
    if mode == "training":
        metrics = trainer.train()
        printlog(f"training done: {metrics}")
        if config.get("run_final_val"):
            trainer.infer()
    elif mode in ("inference", "submission_inference"):
        trainer.infer()
    elif mode == "demo_tsne":
        trainer.demo_tsne()
    elif mode == "diagnostics":
        trainer.run_diagnostic()
    else:
        raise ValueError(f"mode {mode} not supported")


if __name__ == "__main__":
    main()
