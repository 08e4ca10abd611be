"""Uncertainty head + von Mises NLL loss."""
import os

import numpy as np

from heal_tpu.config import load_yaml

CFG_DIR = os.path.join(os.path.dirname(__file__), "configs")


class TestVonMises:
    def test_nll_minimized_at_match(self):
        import jax.numpy as jnp

        from heal_tpu.losses.point_pillar_uncertainty_loss import (
            von_mises_nll,
        )

        k = jnp.asarray(1.5)
        target = jnp.asarray(0.7)
        nll_match = von_mises_nll(target, target, k)
        nll_off = von_mises_nll(target + 1.0, target, k)
        assert float(nll_match) < float(nll_off)

    def test_log_i0_stable_large(self):
        import jax.numpy as jnp

        from heal_tpu.losses.point_pillar_uncertainty_loss import log_i0

        v = log_i0(jnp.asarray(500.0))
        # asymptotic: log I0(k) ~ k - 0.5 log(2 pi k)
        approx = 500.0 - 0.5 * np.log(2 * np.pi * 500.0)
        assert np.isfinite(float(v))
        assert abs(float(v) - approx) < 0.01


class TestUncertaintyModel:
    def test_train_step(self):
        import jax

        from heal_tpu.data import build_dataset
        from heal_tpu.losses import build_loss
        from heal_tpu.models import build_model
        from heal_tpu.parallel import Trainer
        from heal_tpu.parallel.schedulers import build_optimizer
        from heal_tpu.parallel.trainer import to_device

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_intermediate.yaml"))
        cfg["fusion"]["core_method"] = "late"
        cfg["model"] = {
            "core_method": "point_pillar_uncertainty",
            "args": dict(cfg["model"]["args"]),
        }
        cfg["model"]["args"].pop("fusion_method", None)
        cfg["loss"] = {
            "core_method": "point_pillar_uncertainty_loss",
            "args": {
                "pos_cls_weight": 2.0,
                "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0},
                "reg": {"sigma": 3.0, "weight": 2.0},
                "uncertainty": {"weight": 0.5},
            },
        }
        ds = build_dataset(cfg, train=True)
        model = build_model(cfg["model"])
        criterion = build_loss(cfg["loss"])
        tx = build_optimizer(cfg["optimizer"], cfg.get("lr_scheduler"), 4)
        trainer = Trainer(model=model, criterion=criterion, tx=tx).compile()
        batch = to_device(next(ds.batches(2)))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        state, aux = trainer.train_step(state, batch)
        assert "unc_loss" in aux
        assert np.isfinite(float(aux["total_loss"]))
