"""Profile the flagship train step on the local chip and print top device ops.

Runs the same setup as bench.py, captures a jax.profiler trace of a few
steps, then parses the perfetto trace.json.gz for device-track events and
aggregates device_duration by op name / fusion category.

Usage:  python tools/profile_step.py [--fp32] [--steps N] [--out DIR]
Only device durations from full-step traces are trustworthy on this host
(PERF.md finding 4: sub-ms micro-benchmarks through the axon tunnel are
tunnel-noise).
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_trace(out_dir: str, steps: int, fp32: bool, bs: int, hw: int,
              max_features: int | None = None, recipe: str | None = None,
              graph_overrides: dict | None = None):
    import jax
    from __graft_entry__ import (FLAGSHIP_GRAPH, FLAGSHIP_LOSS,
                                 _build_train_setup, _setup_compile_cache)
    _setup_compile_cache()
    from mscs_tpu.parallel import make_mesh, replicate, shard_batch
    if not fp32:
        from mscs_tpu.models.layers import set_compute_dtype
        set_compute_dtype("bfloat16")
    n_chips = len(jax.devices())
    batch = bs * n_chips
    if recipe:
        from _recipe_setup import build_recipe_setup
        state, step, batch_data, _ = build_recipe_setup(
            recipe, batch, hw, fp32=fp32,
            max_features=max_features or 2048,
            graph_overrides=graph_overrides)
    else:
        loss_cfg = dict(FLAGSHIP_LOSS)
        if max_features:
            loss_cfg["max_features_total"] = max_features
        state, step, batch_data = _build_train_setup(
            dict(FLAGSHIP_GRAPH), loss_cfg, batch=batch, hw=hw)
    mesh = make_mesh()
    state = replicate(mesh, state)
    batch_data = shard_batch(mesh, batch_data)
    step = jax.jit(step, donate_argnums=(0,))
    rng = jax.random.key(0)
    state, logs = step(state, batch_data, rng, 0)
    jax.block_until_ready(logs["loss"])

    # fetch-anchored timing (bench.py r5): block_until_ready has acked
    # before execution through the tunnel (this tool once printed 769 img/s
    # wall against 408 ms/step device time)
    t0 = time.perf_counter()
    for _ in range(5):
        state, logs = step(state, batch_data, rng, 0)
    float(logs["loss"])
    step_ms = (time.perf_counter() - t0) / 5 * 1000

    jax.profiler.start_trace(out_dir)
    for _ in range(steps):
        state, logs = step(state, batch_data, rng, 0)
    jax.block_until_ready(logs["loss"])
    jax.profiler.stop_trace()
    return step_ms, batch


def parse(out_dir: str, steps: int):
    traces = glob.glob(os.path.join(
        out_dir, "**", "*trace.json.gz"), recursive=True)
    if not traces:
        raise SystemExit(f"no trace.json.gz under {out_dir}")
    path = max(traces, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # device tracks: pid whose process_name metadata mentions TPU/device
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if re.search(r"TPU|/device", n, re.I)}
    agg = collections.Counter()
    bycat = collections.Counter()
    bymod = collections.Counter()
    # conv-site efficiency: tf_op -> [ms, flops, n]
    convs = collections.defaultdict(lambda: [0.0, 0, 0])
    total, flops = 0.0, 0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_name.get((e["pid"], e["tid"]), "")
        if "step" in tname.lower() or "XLA Modules" in tname:
            continue  # container tracks double-count
        a = e.get("args") or {}
        dur = e.get("dur", 0) / 1000.0  # us -> ms
        name = e.get("name", "?")
        total += dur
        try:
            flops += int(a.get("model_flops") or 0)
        except (TypeError, ValueError):
            pass
        agg[re.sub(r"[.\d]+$", "", name)] += dur
        bycat[a.get("hlo_category", "?")] += dur
        top = str(a.get("tf_op", ""))
        m = re.search(r"(jvp\(\w+\)|transpose\(jvp\(\w+\)\))/([\w.]+)", top)
        bymod[(m.group(1) + "/" + m.group(2)) if m else top[:60]] += dur
        if a.get("hlo_category") == "convolution fusion":
            key = re.sub(r"_\d+|module\d+|block\d+|stage\d+", "",
                         top.strip(": "))
            convs[key][0] += dur
            try:
                convs[key][1] += int(a.get("model_flops") or 0)
            except (TypeError, ValueError):
                pass
            convs[key][2] += 1
    print(f"\ntrace: {path}")
    print(f"total device time: {total:.1f} ms over {steps} steps "
          f"=> {total / steps:.1f} ms/step; "
          f"model flops {flops / 1e12:.2f} TF "
          f"=> {flops / 1e9 / total:.1f} TF/s avg")
    print("\n== by hlo_category (ms per step) ==")
    for name, ms in bycat.most_common(12):
        print(f"  {ms / steps:8.2f}  {name}")
    print("\n== by op family (ms per step) ==")
    for name, ms in agg.most_common(15):
        print(f"  {ms / steps:8.2f}  {name}")
    print("\n== by module (ms per step) ==")
    for name, ms in bymod.most_common(15):
        print(f"  {ms / steps:8.2f}  {name}")
    print("\n== conv sites (ms/step, effective TF/s) ==")
    rows = sorted(convs.items(), key=lambda kv: -kv[1][0])
    for k, (ms, fl, n) in rows[:20]:
        tfs = fl / 1e9 / ms if ms else 0
        print(f"  {ms / steps:8.2f} {tfs:6.1f} n={n:4d}  {k[:100]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--out", default="/tmp/mscs_profile")
    ap.add_argument("--max-features", type=int, default=None)
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--recipe", default=None,
                    help="profile a shipped recipe (hrnet/upnswin/hrnetocr) "
                         "instead of the flagship synthetic setup")
    ap.add_argument("--graph-override", default=None,
                    help='JSON dict merged into config["graph"]')
    args = ap.parse_args()
    if not args.parse_only:
        import json as _json
        step_ms, batch = run_trace(args.out, args.steps, args.fp32,
                                   args.bs, args.hw, args.max_features,
                                   recipe=args.recipe,
                                   graph_overrides=_json.loads(
                                       args.graph_override)
                                   if args.graph_override else None)
        print(f"steady-state: {step_ms:.1f} ms/step "
              f"({batch / step_ms * 1000:.1f} img/s)")
    parse(args.out, args.steps)


if __name__ == "__main__":
    main()
