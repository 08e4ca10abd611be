"""Knowledge-distillation trainer (DiscoNet).

Reference: tools/train_w_kd.py — a frozen early-fusion teacher (trained on
all agents' points projected into the ego frame) supervises the
intermediate-fusion student through a feature-imitation loss
(point_pillar_disconet_loss).

    python -m heal_tpu.tools.train_w_kd -y student.yaml \
        --teacher_dir runs/teacher [--model_dir runs/student]
"""
from __future__ import annotations

import argparse

import jax
import numpy as np

from ..config import load_yaml
from ..data import build_dataset
from ..losses import build_loss
from ..models import build_model
from ..parallel import Trainer
from ..parallel.schedulers import build_optimizer
from ..parallel.trainer import to_device
from . import checkpoint as ckpt_lib
from .train import setup_run_dir


class KDTrainer(Trainer):
    """Adds the frozen teacher's fused feature to the student outputs."""

    teacher_apply = None  # (batch) -> teacher feature

    def _loss_fn(self, params, batch_stats, batch, step_rng=None):
        variables = {"params": params}
        mutable = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        out, mutated = self._apply_train(variables, batch, mutable, step_rng)
        if self.teacher_apply is not None:
            out["teacher_feature"] = jax.lax.stop_gradient(
                self.teacher_apply(batch)
            )
        from ..parallel.trainer import _label_targets

        loss, aux = self.criterion(out, _label_targets(batch))
        new_stats = mutated.get("batch_stats", batch_stats)
        return loss, (aux, new_stats)


def main(argv=None):
    p = argparse.ArgumentParser("heal_tpu train_w_kd")
    p.add_argument("--hypes_yaml", "-y", required=True)
    p.add_argument("--teacher_dir", required=True)
    p.add_argument("--model_dir", default="")
    p.add_argument("--epochs", type=int, default=None)
    args = p.parse_args(argv)

    cfg = load_yaml(args.hypes_yaml)
    model_dir = setup_run_dir(cfg, args)

    teacher_cfg = load_yaml("", model_dir=args.teacher_dir)
    teacher = build_model(teacher_cfg["model"])
    _, tpath = ckpt_lib.find_checkpoint(args.teacher_dir)
    tckpt = ckpt_lib.load_checkpoint(tpath)
    tvars = {"params": tckpt["params"]}
    if tckpt.get("batch_stats"):
        tvars["batch_stats"] = tckpt["batch_stats"]

    def teacher_apply(batch):
        # teacher consumes the early-fusion view: merged ego-frame points
        tb = {
            "points": batch["teacher_points"],
            "point_mask": batch["teacher_point_mask"],
        }
        out = teacher.apply(tvars, tb, train=False)
        return out["spatial_features_2d"]

    train_ds = build_dataset(cfg, train=True)
    model = build_model(cfg["model"])
    criterion = build_loss(cfg["loss"])
    batch_size = cfg["train_params"]["batch_size"]
    epochs = args.epochs or cfg["train_params"]["epoches"]
    steps = max(len(train_ds) // batch_size, 1)
    tx = build_optimizer(cfg["optimizer"], cfg.get("lr_scheduler"), steps)

    trainer = KDTrainer(model=model, criterion=criterion, tx=tx)
    trainer.teacher_apply = teacher_apply
    example = to_device(next(train_ds.batches(batch_size, shuffle=False)))
    state = trainer.init_state(jax.random.PRNGKey(0), example)
    trainer.compile()

    for epoch in range(epochs):
        losses = []
        for batch in train_ds.batches(batch_size, shuffle=True, seed=epoch):
            state, aux = trainer.train_step(state, to_device(batch))
            losses.append(float(aux["total_loss"]))
        print(f"[kd epoch {epoch}] loss {np.mean(losses):.4f}")
        ckpt_lib.save_checkpoint(
            model_dir,
            {
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
            },
            epoch + 1,
        )
    return model_dir


if __name__ == "__main__":
    main()
