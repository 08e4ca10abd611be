"""CenterPoint anchor-free family: targets, loss, model, decode."""
import os

import numpy as np
import pytest

from heal_tpu.config import load_yaml

CFG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def make_cfg():
    cfg = load_yaml(os.path.join(CFG_DIR, "tiny_intermediate.yaml"))
    cfg["model"] = {
        "core_method": "center_point_baseline",
        "args": dict(
            cfg["model"]["args"],
            fusion_method="max",
        ),
    }
    cfg["model"]["args"].pop("dir_args", None)
    cfg["loss"] = {
        "core_method": "center_point_loss",
        "args": {"cls": {"weight": 1.0}, "reg": {"weight": 2.0, "sigma": 3.0}},
    }
    return cfg


class TestCenterTargets:
    def test_heatmap_peaks_at_centers(self):
        from heal_tpu.postprocess.targets import generate_center_targets

        gt = np.zeros((2, 7))
        gt[0] = [0.0, 0.0, -1.0, 1.56, 1.6, 3.9, 0.3]
        mask = np.array([1.0, 0.0])
        out = generate_center_targets(
            gt, mask, (64, 64), [-38.4, -38.4, -3, 38.4, 38.4, 1], 1.2
        )
        assert out["heatmap"].max() == 1.0
        ci, cj = np.unravel_index(
            out["heatmap"][..., 0].argmax(), (64, 64)
        )
        assert (ci, cj) == (32, 32)
        assert out["reg_mask"][ci, cj] == 1.0
        np.testing.assert_allclose(out["box_targets"][ci, cj], gt[0])


class TestCenterPointTrain:
    @pytest.mark.slow
    def test_loss_decreases(self):
        import jax

        from heal_tpu.data import build_dataset
        from heal_tpu.losses import build_loss
        from heal_tpu.models import build_model
        from heal_tpu.parallel import Trainer
        from heal_tpu.parallel.schedulers import build_optimizer
        from heal_tpu.parallel.trainer import to_device

        cfg = make_cfg()
        ds = build_dataset(cfg, train=True)
        sample = ds[0]
        assert "heatmap" in sample
        model = build_model(cfg["model"])
        criterion = build_loss(cfg["loss"])
        tx = build_optimizer(cfg["optimizer"], cfg.get("lr_scheduler"), 4)
        trainer = Trainer(model=model, criterion=criterion, tx=tx).compile()
        batch = to_device(next(ds.batches(2)))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        losses = []
        for _ in range(8):
            state, aux = trainer.train_step(state, batch)
            losses.append(float(aux["total_loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_anchor_free_decode(self):
        import jax.numpy as jnp

        from heal_tpu.postprocess.decode import (
            post_process_single,
            strip_padding,
        )

        h = w = 32
        cls = np.full((h, w, 1), -9.0, np.float32)
        reg = np.zeros((h, w, 7), np.float32)
        cls[10, 12] = 9.0
        box = [1.1, 0.3, -1.0, 1.56, 1.6, 3.9, 0.4]
        reg[10, 12] = box
        out = post_process_single(
            jnp.asarray(cls),
            jnp.asarray(reg),
            None,
            jnp.zeros((h, w, 1, 7)),
            jnp.eye(4),
            jnp.asarray([-38.4, -38.4, -3, 38.4, 38.4, 1.0]),
            max_det=16,
            anchor_free=True,
        )
        dense = strip_padding(out)
        assert dense["boxes"].shape[0] == 1
        np.testing.assert_allclose(dense["boxes"][0], box, atol=1e-5)
