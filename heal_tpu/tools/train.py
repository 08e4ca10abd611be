"""Trainer CLI.

Reference: tools/train.py (:32-189). Usage:
    python -m heal_tpu.tools.train -y cfg.yaml [--model_dir runs/x]
Resumes from model_dir/config.yaml + latest checkpoint when model_dir
holds one. Runs inference in-process at the end (reference shells out).
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from ..config import load_yaml, save_yaml
from ..data import build_dataset
from ..losses import build_loss
from ..models import build_model
from ..parallel import Trainer
from ..parallel.freezing import freeze_wrap
from ..parallel.schedulers import build_optimizer
from ..parallel.trainer import to_device
from . import checkpoint as ckpt_lib
from ..utils.jit_cache import enable_persistent_cache


def parse_args(argv=None):
    p = argparse.ArgumentParser("heal_tpu train")
    p.add_argument("--hypes_yaml", "-y", required=False, default=None)
    p.add_argument("--model_dir", default="", help="resume / output dir")
    p.add_argument("--epochs", type=int, default=None, help="override epochs")
    p.add_argument("--tag", default="default")
    p.add_argument("--no_final_inference", action="store_true")
    p.add_argument("--init_from", default=None,
                   help="checkpoint path to loosely load before training "
                        "(HEAL stage-2: the stage-1 collab base)")
    p.add_argument("--devices", default=0,
                   help="device mesh: N (data-parallel) or DxAxM "
                        "(data x agent x model; 0 = single device;"
                        " replaces the reference's DDP/NCCL)")
    return p.parse_args(argv)


def backup_source(model_dir: str) -> None:
    """Snapshot the heal_tpu source into the run dir so every training
    run stays reproducible even after the tree moves on (reference
    tools/train_utils.backup_script:15-26 copies models/data_utils/
    utils/loss into the log dir)."""
    import shutil

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = os.path.join(model_dir, "scripts")
    if os.path.exists(dst):
        return
    shutil.copytree(
        pkg_root,
        os.path.join(dst, "heal_tpu"),
        ignore=shutil.ignore_patterns("__pycache__", "*.so", "*.o"),
    )


def setup_run_dir(cfg: dict, args) -> str:
    if args.model_dir:
        model_dir = args.model_dir
    else:
        stamp = time.strftime("%Y_%m_%d_%H_%M_%S")
        model_dir = os.path.join("heal_tpu_logs", f"{cfg['name']}_{stamp}")
    os.makedirs(model_dir, exist_ok=True)
    save_yaml(cfg, os.path.join(model_dir, "config.yaml"))
    backup_source(model_dir)
    return model_dir


def main(argv=None):
    enable_persistent_cache()
    args = parse_args(argv)
    assert args.hypes_yaml or args.model_dir, "need -y or --model_dir"
    cfg = load_yaml(args.hypes_yaml or "", model_dir=args.model_dir or None)
    model_dir = setup_run_dir(cfg, args)

    train_ds = build_dataset(cfg, train=True)
    val_ds = build_dataset(cfg, train=False)

    model = build_model(cfg["model"])
    criterion = build_loss(cfg["loss"])
    if hasattr(criterion, "set_anchors"):
        criterion.set_anchors(train_ds.anchors)  # IoU-branch box decode

    batch_size = cfg["train_params"]["batch_size"]
    epochs = args.epochs or cfg["train_params"]["epoches"]
    eval_freq = cfg["train_params"].get("eval_freq", 2)
    save_freq = cfg["train_params"].get("save_freq", 2)
    steps_per_epoch = max(len(train_ds) // batch_size, 1)

    tx = build_optimizer(
        cfg["optimizer"], cfg.get("lr_scheduler"), steps_per_epoch
    )

    mesh = None
    if args.devices:
        from ..parallel import make_mesh

        # "--devices 8" = pure data parallel; "--devices 2x2x2" =
        # (data, agent, model) mesh — see parallel/sharding.py
        dims = [int(d) for d in str(args.devices).lower().split("x")]
        data, agent, model_ax = (dims + [1, 1])[:3]
        n = data * agent * model_ax
        mesh = make_mesh(n, agent=agent, model=model_ax)
        assert batch_size % data == 0, (
            "batch_size must divide across the mesh data axis"
        )
        print(
            f"[train] mesh over {n} devices "
            f"(data={data}, agent={agent}, model={model_ax})"
        )

    # stage-2 / compressor finetune: fix_modules stay frozen (params via
    # optimizer masking, batch_stats via freeze_stats in the trainer)
    fix_modules = tuple(getattr(model, "fix_modules", ()))

    example = to_device(next(train_ds.batches(batch_size, shuffle=False)))
    trainer = Trainer(
        model=model,
        criterion=criterion,
        tx=tx,
        supervise_single=cfg["model"]["args"].get("supervise_single", False),
        single_weight=cfg["loss"]["args"].get("single_weight", 1.0),
        mesh=mesh,
        fix_modules=fix_modules,
        # mixed-precision training (torch-AMP equivalent, --half in
        # train_ddp.py): train_params.bf16: true in the config
        bf16=bool(cfg["train_params"].get("bf16", False)),
    )
    state = trainer.init_state(jax.random.PRNGKey(0), example)

    # stage-2: loosely load the stage-1 base, then freeze fix_modules
    if args.init_from:
        src = ckpt_lib.load_checkpoint(args.init_from)
        params = jax.tree.map(np.asarray, jax.device_get(state.params))
        stats = jax.tree.map(np.asarray, jax.device_get(state.batch_stats))
        ckpt_lib.loose_update(params, src.get("params", {}))
        ckpt_lib.loose_update(stats, src.get("batch_stats", {}))
        state = state.replace(params=params, batch_stats=stats)
    if fix_modules:
        trainer.tx = freeze_wrap(tx, jax.device_get(state.params), fix_modules)
        state = state.replace(opt_state=trainer.tx.init(state.params))
        print(f"[train] frozen modules: {fix_modules}")

    start_epoch = 0
    ep, path = ckpt_lib.find_checkpoint(model_dir) if args.model_dir else (0, None)
    if path:
        src = ckpt_lib.load_checkpoint(path)
        state = state.replace(
            params=src["params"], batch_stats=src.get("batch_stats", {})
        )
        start_epoch = int(src.get("epoch", ep))
        print(f"[train] resumed from {path} (epoch {start_epoch})")

    trainer.compile()
    state = trainer.shard_state(state)
    from .logging import MetricLogger

    # Device-resident epoch cache (train_params.cache_device_batches):
    # assemble + transfer every batch ONCE, keep it in HBM, and reshuffle
    # at batch granularity per epoch. This removes the host data pipeline
    # from the steady-state loop entirely — the TPU-first answer to the
    # reference's multi-worker DataLoader (this box has 1 CPU core, and
    # the per-step host->device transfer also leaks host memory in the
    # axon TPU client, ~14 MB/step). Trade-offs, so opt-in only: shuffle
    # is between batches rather than between samples, and per-epoch
    # backend reinitialization (modality re-assignment) is skipped — use
    # for fixed-assignment runs (synthetic demos, single-modality).
    cached_train = cached_val = None
    if cfg["train_params"].get("cache_device_batches"):
        cached_train = [
            trainer.shard_batch(to_device(b))
            for b in train_ds.batches(batch_size, shuffle=False)
        ]
        cached_val = [
            to_device(b)
            for b in val_ds.batches(batch_size, shuffle=False)
        ]
        nbytes = sum(
            x.nbytes
            for b in cached_train
            for x in jax.tree.leaves(b)
            if hasattr(x, "nbytes")
        )
        print(
            f"[train] cached {len(cached_train)} train batches on device "
            f"({nbytes / 1e9:.2f} GB)"
        )

    logger = MetricLogger(model_dir)
    best_val = float("inf")
    for epoch in range(start_epoch, epochs):
        # per-epoch re-randomization (agent order / modality assignment),
        # reference train.py:175-177
        if cached_train is not None:
            order = np.random.default_rng(epoch).permutation(
                len(cached_train)
            )
            epoch_batches = (cached_train[i] for i in order)
        else:
            if hasattr(train_ds.backend, "reinitialize"):
                train_ds.backend.reinitialize(seed=epoch)
            # double-buffered pipeline: a worker thread assembles and
            # transfers batch k+1 while the device runs step k
            # (data/prefetch.py; replaces the reference's DataLoader
            # workers, train.py:42-57)
            from ..data.prefetch import prefetch

            epoch_batches = prefetch(
                train_ds.batches(batch_size, shuffle=True, seed=epoch),
                lambda b: trainer.shard_batch(to_device(b)),
                depth=3,
            )
        t0 = time.time()
        losses = []
        for batch in epoch_batches:
            state, aux = trainer.train_step(state, batch)
            # keep device scalars; ONE sync at epoch end (each float()
            # here would cost a full dispatch round-trip per step)
            losses.append(
                {k: v for k, v in aux.items() if v.ndim == 0}
            )
        losses = jax.tree.map(float, losses)
        dt = time.time() - t0
        mean_aux = {
            k: float(np.mean([x[k] for x in losses if k in x]))
            for k in losses[0]
        }
        logger.log(epoch, dict(mean_aux, samples_per_sec=(
            steps_per_epoch * batch_size / dt
        )))
        print(
            f"[epoch {epoch}] loss {mean_aux['total_loss']:.4f} "
            f"({steps_per_epoch * batch_size / dt:.2f} samples/s)"
        )

        if (epoch + 1) % save_freq == 0 or epoch == epochs - 1:
            ckpt_lib.save_checkpoint(
                model_dir,
                {
                    "params": jax.device_get(state.params),
                    "batch_stats": jax.device_get(state.batch_stats),
                },
                epoch + 1,
            )
        if (epoch + 1) % eval_freq == 0 or epoch == epochs - 1:
            val_batches = (
                cached_val
                if cached_val is not None
                else (to_device(b)
                      for b in val_ds.batches(batch_size, shuffle=False))
            )
            vlosses = [
                float(trainer.eval_step(state, b)["total_loss"])
                for b in val_batches
            ]
            vloss = float(np.mean(vlosses)) if vlosses else float("inf")
            print(f"[epoch {epoch}] val loss {vloss:.4f}")
            if vloss < best_val:
                best_val = vloss
                ckpt_lib.save_checkpoint(
                    model_dir,
                    {
                        "params": jax.device_get(state.params),
                        "batch_stats": jax.device_get(state.batch_stats),
                    },
                    epoch + 1,
                    bestval=True,
                )

    if not args.no_final_inference:
        from .inference import run_inference

        run_inference(model_dir)
    return model_dir


if __name__ == "__main__":
    main()
