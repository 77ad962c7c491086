"""LR schedules — jax-traceable port of reference ``utils/lr_functions.py``.

The reference builds a python ``LRFcts`` callable for torch LambdaLR (final
lr = base_lr * fct(step)).  Here the same families (static / piecewise_static
/ exponential / polynomial / cosine, all with restarts, plus
linear-warmup-polynomial) are produced as optax-compatible schedules: a pure
function of a traced step returning the absolute learning rate.

Batchwise conversion (epoch counts -> step counts, reference
``managers/BaseManager.py:530-546``) is the caller's job via
``convert_restarts_to_steps``.
"""
from __future__ import annotations

from typing import Any, Callable

import numpy as np
import jax.numpy as jnp


def convert_restarts_to_steps(restart_epochs: list[int],
                              batches_per_epoch: list[int]) -> list[int]:
    """Epoch-indexed restarts -> cumulative step counts (ref :530-540)."""
    r = [0] + list(restart_epochs)
    out: list[int] = []
    for i in range(len(r) - 1):
        out.append(int(np.sum(batches_per_epoch[r[i]:r[i + 1]]) + np.sum(out[:i])))
    return out


def make_lr_schedule(train_config: dict[str, Any],
                     lr_restart_steps: list[int],
                     lr_total_steps: int) -> Callable:
    base_lr = float(train_config["learning_rate"])
    lr_fct = train_config["lr_fct"]
    lr_params = train_config.get("lr_params") or {}
    uses_restarts = len(lr_restart_steps) > 0

    if uses_restarts:
        restarts = list(lr_restart_steps)
        restart_vals_cfg = train_config.get("lr_restart_vals", 0.5)
        if 0 not in restarts:
            restarts.insert(0, 0)
        vals = [1.0]
        if isinstance(restart_vals_cfg, (int, float)):
            for i in range(1, len(restarts)):
                vals.append(vals[i - 1] * restart_vals_cfg)
        else:
            vals.extend(restart_vals_cfg)
        if lr_total_steps not in restarts:
            restarts.append(lr_total_steps)
            vals.append(0.0)
        restarts_np = np.asarray(restarts, np.int32)
        vals_np = np.asarray(vals, np.float32)
        lengths_np = np.ones_like(restarts_np)
        lengths_np[:-1] = restarts_np[1:] - restarts_np[:-1]

    power = float(lr_params.get("power", 0.9))
    min_lr = float(lr_params.get("min_lr", 0.0))
    gamma = float(lr_params.get("gamma", 0.98))
    # poly denominator is (total - 1) like the reference
    # (lr_functions.py:67-136); clamp to 1 so the degenerate 1-step
    # schedule (debug runs on tiny datasets) yields lr=base, not nan
    poly_denom = max(lr_total_steps - 1, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if not uses_restarts:
            if lr_fct == "polynomial":
                coeff = (1 - step / poly_denom) ** power
                return base_lr * ((1.0 - min_lr) * coeff + min_lr)
            if lr_fct == "exponential":
                return base_lr * gamma ** step
            if lr_fct == "linear-warmup-polynomial":
                wi = float(lr_params["warmup_iters"])
                wr = float(lr_params["warmup_rate"])
                warm = 1 - (1 - (step + 1) / wi) * (1 - wr)
                coeff = (1 - step / poly_denom) ** power
                poly = (1.0 - min_lr) * coeff + min_lr
                return base_lr * jnp.where(step <= wi - 1, warm, poly)
            if lr_fct == "static":
                return jnp.asarray(base_lr, jnp.float32)
            raise ValueError(f"lr schedule without restarts '{lr_fct}'")

        rs = jnp.asarray(restarts_np, jnp.float32)
        vs = jnp.asarray(vals_np)
        ls = jnp.asarray(lengths_np, jnp.float32)
        idx = jnp.clip(jnp.sum(step >= rs) - 1, 0, len(restarts_np) - 1)
        since = step - rs[idx]
        base_val = vs[idx]
        if lr_fct == "static":
            return base_lr * base_val
        if lr_fct == "piecewise_static":
            sched = lr_params["piecewise_static_schedule"]
            ends = jnp.asarray([p[0] for p in sched], jnp.float32)
            lrs = jnp.asarray([p[1] for p in sched], jnp.float32)
            i = jnp.clip(jnp.sum(step > ends), 0, len(sched) - 1)
            return base_lr * lrs[i]
        if lr_fct == "exponential":
            return base_lr * base_val * gamma ** since
        if lr_fct == "polynomial":
            coeff = (1 - since / jnp.maximum(ls[idx] - 1, 1)) ** power
            return base_lr * ((base_val - min_lr) * coeff + min_lr)
        if lr_fct == "cosine":
            return base_lr * base_val * 0.5 * (1 + jnp.cos(jnp.pi * since / ls[idx]))
        raise ValueError(f"lr schedule '{lr_fct}' not recognised")

    return schedule
