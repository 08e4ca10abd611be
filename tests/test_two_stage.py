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
    @pytest.mark.slow
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
    @pytest.mark.slow
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


class TestPairwiseConvention:
    def test_agent_to_ego_is_column_zero(self):
        """pairwise[i, j] maps frame i -> frame j, so agent j -> ego is
        pairwise[j, 0] (batch index [:, j, 0]) — guards the FPV-RCNN
        proposal projection (models/fpvrcnn.py)."""
        import numpy as np

        from heal_tpu.utils import transform_np

        poses = [[0, 0, 0, 0, 0, 0], [10, 5, 0, 0, 30, 0]]
        pw = transform_np.get_pairwise_transformation(poses, 2)
        origin_of_agent_in_ego = pw[1, 0] @ np.array([0, 0, 0, 1.0])
        np.testing.assert_allclose(
            origin_of_agent_in_ego[:2], [10, 5], atol=1e-6
        )
        # the row-0 matrix is the INVERSE map (ego -> agent), used only
        # for backward warping
        back = pw[0, 1] @ origin_of_agent_in_ego
        np.testing.assert_allclose(back[:3], [0, 0, 0], atol=1e-6)


class TestStage2Decode:
    def test_roundtrip_with_loss_target_convention(self):
        """decode_stage2(roi, encode(roi, gt)) == gt — the decode must be
        the exact inverse of the residual targets fpvrcnn_loss builds."""
        import jax.numpy as jnp
        import numpy as np

        from heal_tpu.postprocess.decode import decode_stage2

        rng = np.random.default_rng(0)
        r = 12
        rois = np.column_stack([
            rng.uniform(-30, 30, (r, 2)),          # x y
            rng.uniform(-1.5, -0.5, (r, 1)),       # z
            rng.uniform(1.3, 1.8, (r, 1)),         # h
            rng.uniform(1.4, 1.9, (r, 1)),         # w
            rng.uniform(3.5, 4.5, (r, 1)),         # l
            rng.uniform(-1, 1, (r, 1)),            # yaw
        ]).astype(np.float32)
        gt = rois + rng.uniform(-0.2, 0.2, rois.shape).astype(np.float32)

        # encode per losses/fpvrcnn_loss.py
        diag = np.sqrt(rois[:, 4] ** 2 + rois[:, 5] ** 2)
        scale = np.stack([diag, diag, rois[:, 3]], axis=-1)
        t_xyz = (gt[:, :3] - rois[:, :3]) / scale
        t_dim = np.log(gt[:, 3:6] / rois[:, 3:6])
        t_yaw = gt[:, 6:7] - rois[:, 6:7]
        reg = np.concatenate([t_xyz, t_dim, t_yaw], axis=-1)

        det = decode_stage2(
            jnp.asarray(rois),
            jnp.ones(r, bool),
            jnp.full((r,), 4.0),  # high logit -> score ~0.98
            jnp.asarray(reg),
            jnp.asarray([-100, -100, -5, 100, 100, 3], jnp.float32),
            score_threshold=0.3,
            nms_threshold=0.15,
        )
        boxes = np.asarray(det["boxes"])
        valid = np.asarray(det["valid"])
        # every distinct roi decodes back to its gt (order may differ)
        got = boxes[valid]
        assert got.shape[0] >= 1
        for g in got:
            assert np.min(np.abs(gt - g).sum(1)) < 1e-3
