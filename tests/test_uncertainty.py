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


class TestIoUBranch:
    def test_aligned_iou3d_identity_and_disjoint(self):
        from heal_tpu.utils.rotated_iou import aligned_boxes_iou3d

        a = np.array(
            [
                [0, 0, 0, 1.5, 1.6, 3.9, 0.3],
                [0, 0, 0, 1.5, 1.6, 3.9, 0.0],
            ]
        )
        b = np.array(
            [
                [0, 0, 0, 1.5, 1.6, 3.9, 0.3],
                [50, 50, 0, 1.5, 1.6, 3.9, 0.0],
            ]
        )
        iou = aligned_boxes_iou3d(a, b)
        np.testing.assert_allclose(iou, [1.0, 0.0], atol=1e-5)
        # half z-overlap, same footprint
        c = a.copy()
        c[:, 2] += 0.75
        iou2 = aligned_boxes_iou3d(a, c)
        np.testing.assert_allclose(iou2, [1.0 / 3, 1.0 / 3], atol=1e-5)

    def test_loss_branch_runs_and_learns_iou(self):
        """With perfect reg targets, iou head regressing toward 1 (=2*1-1)
        reduces the iou loss term."""
        import jax.numpy as jnp

        from heal_tpu.losses.point_pillar_loss import PointPillarLoss
        from heal_tpu.postprocess import generate_anchor_box, generate_targets

        anchor_args = {
            "cav_lidar_range": [-16, -16, -3, 16, 16, 1],
            "l": 3.9, "w": 1.6, "h": 1.56, "r": [0, 90],
            "feature_stride": 2, "num": 2, "vh": 2, "vw": 2, "vd": 4,
            "W": 16, "H": 16, "D": 1,
        }
        anchors = generate_anchor_box(anchor_args, "hwl")
        gt = np.zeros((5, 7))
        gt[0] = [0, 0, 0, 1.56, 1.6, 3.9, 0.05]
        gt_mask = np.zeros(5)
        gt_mask[0] = 1
        label = generate_targets(gt, gt_mask, anchors, 0.6, 0.45, "hwl")
        h, w, a = anchors.shape[:3]

        loss_fn = PointPillarLoss(
            {
                "pos_cls_weight": 2.0,
                "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0},
                "reg": {"sigma": 3.0, "weight": 2.0},
                "iou": {"sigma": 3.0, "weight": 1.0},
            }
        )
        loss_fn.set_anchors(anchors)
        target = {
            "pos_equal_one": jnp.asarray(label["pos_equal_one"][None]),
            "neg_equal_one": jnp.asarray(label["neg_equal_one"][None]),
            "targets": jnp.asarray(label["targets"][None]),
        }
        out_base = {
            "cls_preds": jnp.zeros((1, h, w, a)),
            "reg_preds": jnp.asarray(label["targets"][None]),  # perfect reg
        }
        # iou head predicting the true value (+1) must beat predicting -1
        good = dict(out_base, iou_preds=jnp.full((1, h, w, a), 1.0))
        bad = dict(out_base, iou_preds=jnp.full((1, h, w, a), -1.0))
        _, aux_good = loss_fn(good, target)
        _, aux_bad = loss_fn(bad, target)
        assert "iou_loss" in aux_good
        assert float(aux_good["iou_loss"]) < float(aux_bad["iou_loss"])
        assert float(aux_good["iou_loss"]) < 1e-3

    def test_model_emits_iou_head(self):
        import os

        import jax
        import jax.numpy as jnp

        from heal_tpu.config import load_yaml
        from heal_tpu.data import build_dataset
        from heal_tpu.models import build_model

        cfg = load_yaml(
            os.path.join(
                os.path.dirname(__file__), "configs", "tiny_intermediate.yaml"
            )
        )
        cfg["model"]["args"]["use_iou"] = True
        ds = build_dataset(cfg, train=False)
        batch = jax.tree.map(jnp.asarray, next(ds.batches(1, shuffle=False)))
        model = build_model(cfg["model"])
        v = model.init(jax.random.PRNGKey(0), batch, train=False)
        out = model.apply(v, batch, train=False)
        assert out["iou_preds"].shape == out["cls_preds"].shape


class TestUncertaintyExport:
    def test_decode_exports_per_box_uncertainty(self):
        import jax.numpy as jnp

        from heal_tpu.postprocess import generate_anchor_box
        from heal_tpu.postprocess.decode import post_process_single, strip_padding

        anchor_args = {
            "cav_lidar_range": [-16, -16, -3, 16, 16, 1],
            "l": 3.9, "w": 1.6, "h": 1.56, "r": [0, 90],
            "feature_stride": 2, "num": 2, "vh": 2, "vw": 2, "vd": 4,
            "W": 16, "H": 16, "D": 1,
        }
        anchors = jnp.asarray(generate_anchor_box(anchor_args, "hwl"))
        h, w, a = anchors.shape[:3]
        cls = jnp.full((h, w, a), -10.0).at[4, 4, 0].set(5.0)
        reg = jnp.zeros((h, w, a * 7))
        unc = jnp.arange(h * w * a * 3, dtype=jnp.float32).reshape(
            h, w, a * 3
        ) / (h * w * a * 3)
        det = post_process_single(
            cls, reg, None, anchors, jnp.eye(4),
            jnp.asarray([-16, -16, -3, 16, 16, 1], jnp.float32),
            order="hwl", score_threshold=0.2, nms_threshold=0.15,
            max_det=64, unc_preds=unc,
        )
        dense = strip_padding({k: np.asarray(v) for k, v in det.items()})
        assert dense["uncertainty"].shape == (1, 3)
        # the exported row is the one at the detected anchor
        flat_idx = (4 * w + 4) * a + 0
        np.testing.assert_allclose(
            dense["uncertainty"][0],
            np.asarray(unc).reshape(-1, 3)[flat_idx],
            rtol=1e-6,
        )
