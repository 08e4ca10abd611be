"""Heterogeneous baseline (swappable fusion) model family."""
import os

import numpy as np

from heal_tpu.config import load_yaml

CFG_DIR = os.path.join(os.path.dirname(__file__), "configs")


class TestHeterBaseline:
    def test_m1m2_baseline_train_step(self):
        import jax

        from heal_tpu.data import build_dataset
        from heal_tpu.losses import build_loss
        from heal_tpu.models import build_model
        from heal_tpu.parallel import Trainer
        from heal_tpu.parallel.schedulers import build_optimizer
        from heal_tpu.parallel.trainer import to_device

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_heter_m1m2.yaml"))
        cfg["fusion"]["args"]["num_agents"] = 2
        args = dict(cfg["model"]["args"])
        args.pop("fusion_backbone")
        args.pop("supervise_single", None)
        args["fusion_method"] = "att"
        args["in_head"] = 32
        args["shrink_header"] = {
            "kernal_size": [3], "stride": [1], "padding": [1],
            "dim": [32], "input_dim": 32,
        }
        cfg["model"] = {"core_method": "heter_model_baseline", "args": args}
        cfg["loss"] = {
            "core_method": "point_pillar_loss",
            "args": {
                "pos_cls_weight": 2.0,
                "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0},
                "reg": {"sigma": 3.0, "weight": 2.0},
                "depth": {"weight": 1.0},
            },
        }
        ds = build_dataset(cfg, train=True)
        model = build_model(cfg["model"])
        criterion = build_loss(cfg["loss"])
        tx = build_optimizer(cfg["optimizer"], cfg.get("lr_scheduler"), 4)
        trainer = Trainer(model=model, criterion=criterion, tx=tx).compile()
        batch = to_device(next(ds.batches(1)))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        state, aux = trainer.train_step(state, batch)
        assert np.isfinite(float(aux["total_loss"]))
        assert "depth_loss" in aux  # camera branch supervised through KD..
        out = trainer.eval_step(state, batch)
        assert np.isfinite(float(out["total_loss"]))
