"""Optimizer + LR-schedule factory from the config.

Reference semantics: tools/train_utils.py:213-274 — any optimizer by name
(we support the ones the configs use), schedulers step / multistep /
exponential, stepped per EPOCH.
"""
from __future__ import annotations

import optax


def build_lr_schedule(opt_cfg: dict, sched_cfg: dict, steps_per_epoch: int):
    base_lr = opt_cfg["lr"]
    method = (sched_cfg or {}).get("core_method", "multistep")
    if method == "step":
        step_size = sched_cfg["step_size"]
        gamma = sched_cfg.get("gamma", 0.1)
        return optax.exponential_decay(
            base_lr,
            transition_steps=step_size * steps_per_epoch,
            decay_rate=gamma,
            staircase=True,
        )
    if method == "multistep":
        gamma = sched_cfg.get("gamma", 0.1)
        boundaries = {
            int(e) * steps_per_epoch: gamma for e in sched_cfg["step_size"]
        }
        return optax.piecewise_constant_schedule(base_lr, boundaries)
    if method == "exponential":
        gamma = sched_cfg.get("gamma", 0.98)
        return optax.exponential_decay(
            base_lr, transition_steps=steps_per_epoch, decay_rate=gamma
        )
    raise KeyError(f"unknown lr_scheduler {method!r}")


def build_optimizer(
    opt_cfg: dict, sched_cfg: dict, steps_per_epoch: int
) -> optax.GradientTransformation:
    schedule = build_lr_schedule(opt_cfg, sched_cfg, steps_per_epoch)
    name = opt_cfg.get("core_method", "Adam").lower()
    args = opt_cfg.get("args", {}) or {}
    wd = args.get("weight_decay", 0.0)
    eps = args.get("eps", 1e-8)
    if name == "adam":
        tx = optax.adam(schedule, eps=eps)
    elif name == "adamw":
        return optax.adamw(schedule, eps=eps, weight_decay=wd)
    elif name == "sgd":
        tx = optax.sgd(schedule, momentum=args.get("momentum", 0.9))
    else:
        raise KeyError(f"unknown optimizer {name!r}")
    if wd:
        # torch-Adam-style L2 (decay folded into the gradient)
        tx = optax.chain(optax.add_decayed_weights(wd), tx)
    return tx
