"""Two-stage stack: CIA-SSD (SSFA + IoU head) and FPV-RCNN
(keypoints -> matcher -> RoI head), plus the pointnet ops."""
import os

import numpy as np
import pytest

from heal_tpu.config import load_yaml

CFG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def _second_args(extra=None):
    cfg = load_yaml(os.path.join(CFG_DIR, "tiny_intermediate.yaml"))
    args = {
        "voxel_size": [0.6, 0.6, 0.5],
        "lidar_range": [-38.4, -38.4, -3, 38.4, 38.4, 1],
        "second": {"channels": [8, 16, 16, 16],
                   "max_voxels": [4000, 3000, 2000, 1500]},
        "ssfa": {"feature_num": 32},
        "anchor_number": 2,
        "dir_args": cfg["postprocess"]["dir_args"],
        "anchor_args": dict(
            cfg["postprocess"]["anchor_args"],
            W=128, H=128, feature_stride=8, vw=0.6, vh=0.6, vd=0.5,
        ),
        **(extra or {}),
    }
    return args


class TestPointOps:
    def test_fps_spreads_and_avoids_padding(self):
        import jax.numpy as jnp

        from heal_tpu.ops.pointnet import farthest_point_sample

        rng = np.random.default_rng(0)
        pts = np.zeros((100, 3), np.float32)
        pts[:50] = rng.uniform(-10, 10, (50, 3))
        pts[50:] = 777.0  # padded garbage
        mask = np.zeros(100, bool)
        mask[:50] = True
        idx = np.asarray(
            farthest_point_sample(jnp.asarray(pts), jnp.asarray(mask), 16)
        )
        assert (idx < 50).all()  # never samples padding
        assert len(set(idx.tolist())) == 16  # distinct picks
        # FPS picks are more spread than random: min pairwise distance
        sel = pts[idx]
        d = np.linalg.norm(sel[:, None] - sel[None], axis=-1)
        d += np.eye(16) * 1e9
        assert d.min() > 1.0

    def test_ball_query_radius_and_mask(self):
        import jax.numpy as jnp

        from heal_tpu.ops.pointnet import ball_query

        pts = np.array(
            [[0, 0, 0], [0.5, 0, 0], [5, 5, 5], [0.1, 0.1, 0]],
            np.float32,
        )
        mask = np.array([True, True, True, False])
        q = np.array([[0.0, 0.0, 0.0]], np.float32)
        idx, valid = ball_query(
            jnp.asarray(q), jnp.asarray(pts), jnp.asarray(mask), 1.0, 3
        )
        hits = set(np.asarray(idx)[0][np.asarray(valid)[0]].tolist())
        assert hits == {0, 1}  # in radius, masked point excluded


class TestMatcher:
    def test_cross_agent_cluster_fusion(self):
        import jax.numpy as jnp

        from heal_tpu.models.fpvrcnn import fuse_proposals

        # two agents see the same box with jitter + one unique box
        box = np.array([2.0, 3.0, 0.0, 1.5, 1.6, 3.9, 0.2])
        other = np.array([20.0, -5.0, 0.0, 1.5, 1.6, 3.9, 1.0])
        boxes = np.zeros((8, 7), np.float32)
        boxes[0] = box
        boxes[1] = box + np.array([0.3, -0.2, 0, 0, 0, 0, 0.05])
        boxes[2] = other
        scores = np.zeros(8, np.float32)
        scores[:3] = [0.9, 0.6, 0.8]
        valid = scores > 0
        fused, fscores, fvalid = fuse_proposals(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)
        )
        fused = np.asarray(fused)[np.asarray(fvalid)]
        assert len(fused) == 2
        # the duplicate pair merged between the two observations
        merged = fused[np.argmin(np.abs(fused[:, 0] - 2.1))]
        assert 2.0 < merged[0] < 2.3
        assert abs(merged[1] - (3.0 * 0.9 + 2.8 * 0.6) / 1.5) < 0.05

    def test_yaw_flip_alignment(self):
        import jax.numpy as jnp

        from heal_tpu.models.fpvrcnn import fuse_proposals

        # same box observed with yaw and yaw+pi must fuse cleanly
        boxes = np.zeros((4, 7), np.float32)
        boxes[0] = [0, 0, 0, 1.5, 1.6, 3.9, 0.1]
        boxes[1] = [0.1, 0, 0, 1.5, 1.6, 3.9, 0.1 + np.pi]
        scores = np.array([0.9, 0.8, 0, 0], np.float32)
        fused, _, fvalid = fuse_proposals(
            jnp.asarray(boxes), jnp.asarray(scores),
            jnp.asarray(scores > 0),
        )
        merged = np.asarray(fused)[np.asarray(fvalid)][0]
        assert abs(merged[6] - 0.1) < 0.06


class TestCiaSSD:
    def test_forward_and_loss(self):
        import jax
        import jax.numpy as jnp

        from heal_tpu.losses import build_loss
        from heal_tpu.models import build_model

        args = _second_args()
        model = build_model({"core_method": "ciassd", "args": args})
        rng = np.random.default_rng(0)
        n = 2048
        pts = np.zeros((1, n, 4), np.float32)
        pts[..., 0] = rng.uniform(-30, 30, (1, n))
        pts[..., 1] = rng.uniform(-30, 30, (1, n))
        pts[..., 2] = rng.uniform(-2, 0.5, (1, n))
        batch = {
            "points": jnp.asarray(pts),
            "point_mask": jnp.ones((1, n), bool),
        }
        v = model.init(jax.random.PRNGKey(0), batch, train=False)
        out = model.apply(v, batch, train=False)
        assert "iou_preds" in out
        assert out["cls_preds"].shape == (1, 16, 16, 2)

        crit = build_loss(
            {
                "core_method": "ciassd_loss",
                "args": {
                    "pos_cls_weight": 2.0,
                    "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0},
                    "reg": {"sigma": 3.0, "weight": 2.0},
                    "iou": {"sigma": 3.0, "weight": 1.0},
                },
            }
        )
        from heal_tpu.postprocess import generate_anchor_box

        anchors = generate_anchor_box(args["anchor_args"], "hwl")
        crit.set_anchors(anchors)
        h, w, a = anchors.shape[:3]
        target = {
            "pos_equal_one": jnp.zeros((1, h, w, a)).at[0, 8, 8, 0].set(1.0),
            "neg_equal_one": jnp.ones((1, h, w, a)).at[0, 8, 8, 0].set(0.0),
            "targets": jnp.zeros((1, h, w, a * 7)),
        }
        loss, aux = crit(out, target)
        assert np.isfinite(float(loss))
        assert "iou_loss" in aux


@pytest.mark.slow
class TestFPVRCNN:
    def test_collab_train_step(self):
        import jax

        from heal_tpu.data import build_dataset
        from heal_tpu.losses import build_loss
        from heal_tpu.models import build_model
        from heal_tpu.parallel import Trainer
        from heal_tpu.parallel.schedulers import build_optimizer
        from heal_tpu.parallel.trainer import to_device

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_intermediate.yaml"))
        cfg["fusion"]["core_method"] = "intermediate2stage"
        cfg["preprocess"]["args"]["max_points"] = 2000
        args = _second_args(
            {
                "stage2": {
                    "proposals_per_agent": 8,
                    "num_keypoints": 128,
                    "grid_size": 3,
                },
                "activate_stage2": True,
            }
        )
        args["anchor_args"] = cfg["postprocess"]["anchor_args"]
        args["anchor_args"]["feature_stride"] = 8
        # re-derive the anchor grid at stride 8 of the SECOND bev
        from heal_tpu.config.loader import PARSER_REGISTRY

        cfg["postprocess"]["anchor_args"]["feature_stride"] = 8
        cfg = PARSER_REGISTRY["load_point_pillar_params"](cfg)
        args["anchor_args"] = cfg["postprocess"]["anchor_args"]
        cfg["model"] = {"core_method": "fpvrcnn", "args": args}
        cfg["loss"] = {
            "core_method": "fpvrcnn_loss",
            "args": {
                "stage1": {
                    "pos_cls_weight": 2.0,
                    "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0},
                    "reg": {"sigma": 3.0, "weight": 2.0},
                },
                "stage2": {"cls_weight": 1.0, "reg_weight": 1.0},
            },
        }
        ds = build_dataset(cfg, train=True)
        sample = ds[0]
        assert "pos_equal_one_single" in sample  # 2stage dataset contract
        model = build_model(cfg["model"])
        criterion = build_loss(cfg["loss"])
        criterion.set_anchors(ds.anchors)
        tx = build_optimizer(cfg["optimizer"], cfg.get("lr_scheduler"), 4)
        trainer = Trainer(model=model, criterion=criterion, tx=tx).compile()
        batch = to_device(next(ds.batches(1)))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        state, aux = trainer.train_step(state, batch)
        assert np.isfinite(float(aux["total_loss"]))
        assert "rcnn_cls_loss" in aux and "rcnn_reg_loss" in aux
        out = trainer.infer_step(state, batch)
        assert "boxes_fused" in out and "rcnn_cls" in out
