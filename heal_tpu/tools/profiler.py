"""Profiler suite: params, FLOPs, inference/train throughput, memory.

Capability parity with reference tools/profiler/* (params_calc.py,
traintp_calc.py, fusion-only variants): parameter counts via the pytree,
analytical FLOPs via jax.jit cost analysis, wall-clock inference fps
(warmup + steady state), training samples/sec, and device memory stats.

    python -m heal_tpu.tools.profiler -y cfg.yaml [--train] [--iters 50]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.jit_cache import enable_persistent_cache, jit_init


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def cost_analysis(fn, *args):
    """Analytical FLOPs + bytes from XLA's cost model."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", float("nan"))),
        "bytes_accessed": float(cost.get("bytes accessed", float("nan"))),
    }


def memory_stats() -> dict:
    try:
        stats = jax.devices()[0].memory_stats() or {}
        return {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        }
    except Exception:
        return {}


def profile_inference(model, variables, batch, iters: int = 50, warmup: int = 5):
    @jax.jit
    def forward(v, b):
        out = model.apply(v, b, train=False)
        return {k: x for k, x in out.items() if not isinstance(x, str)}

    out = None
    for _ in range(warmup):
        out = forward(variables, batch)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(variables, batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return {"fps": iters / dt, "latency_ms": dt / iters * 1000}


def profile_training(trainer, state, batch, iters: int = 20):
    state, aux = trainer.train_step(state, batch)  # compile
    jax.block_until_ready(aux["total_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, aux = trainer.train_step(state, batch)
    jax.block_until_ready(aux["total_loss"])
    dt = time.perf_counter() - t0
    b = batch["pos_equal_one"].shape[0]
    return {"samples_per_sec": iters * b / dt, "step_ms": dt / iters * 1000}


def main(argv=None):
    p = argparse.ArgumentParser("heal_tpu profiler")
    p.add_argument("--hypes_yaml", "-y", required=True)
    p.add_argument("--train", action="store_true")
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args(argv)

    enable_persistent_cache()

    from ..config import load_yaml
    from ..data import build_dataset
    from ..losses import build_loss
    from ..models import build_model
    from ..parallel import Trainer
    from ..parallel.schedulers import build_optimizer
    from ..parallel.trainer import to_device

    cfg = load_yaml(args.hypes_yaml)
    ds = build_dataset(cfg, train=False)
    model = build_model(cfg["model"])
    batch = to_device(next(ds.batches(1, shuffle=False)))
    variables = jit_init(model, jax.random.PRNGKey(0), batch, train=False)

    report = {
        "params": count_params(variables.get("params", variables)),
        "inference": profile_inference(model, variables, batch, args.iters),
    }
    try:
        report["cost"] = cost_analysis(
            lambda v, b: model.apply(v, b, train=False)["cls_preds"],
            variables,
            batch,
        )
    except Exception as e:  # cost analysis is best-effort per backend
        report["cost"] = {"error": str(e)[:100]}

    if args.train:
        criterion = build_loss(cfg["loss"])
        tx = build_optimizer(cfg["optimizer"], cfg.get("lr_scheduler"), 4)
        trainer = Trainer(
            model=model,
            criterion=criterion,
            tx=tx,
            supervise_single=cfg["model"]["args"].get(
                "supervise_single", False
            ),
        ).compile()
        tb = to_device(next(build_dataset(cfg, train=True).batches(
            cfg["train_params"]["batch_size"]
        )))
        state = trainer.init_state(jax.random.PRNGKey(0), tb)
        report["training"] = profile_training(trainer, state, tb)

    report["memory"] = memory_stats()
    print(json.dumps(report, indent=2, default=float))
    return report


if __name__ == "__main__":
    main()
