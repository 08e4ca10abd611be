import numpy as np

from heal_tpu.postprocess import anchors as anchors_mod
from heal_tpu.postprocess import targets as targets_mod
from heal_tpu.utils import box_np


ANCHOR_ARGS = {
    "W": 32,
    "H": 16,
    "l": 3.9,
    "w": 1.6,
    "h": 1.56,
    "r": [0, 90],
    "feature_stride": 2,
    "num": 2,
    "vw": 0.4,
    "vh": 0.4,
    "vd": 4,
    "cav_lidar_range": [-6.4, -3.2, -3, 6.4, 3.2, 1],
}


class TestAnchors:
    def test_shape_and_values(self):
        a = anchors_mod.generate_anchor_box(ANCHOR_ARGS, order="hwl")
        assert a.shape == (8, 16, 2, 7)
        # hwl order: index 3 is h, 4 is w, 5 is l
        np.testing.assert_allclose(a[..., 3], 1.56)
        np.testing.assert_allclose(a[..., 4], 1.6)
        np.testing.assert_allclose(a[..., 5], 3.9)
        np.testing.assert_allclose(a[..., 2], -1.0)
        np.testing.assert_allclose(a[..., 0, 6], 0.0)
        np.testing.assert_allclose(a[..., 1, 6], np.pi / 2)
        # centers inset by one voxel
        assert a[..., 0].min() == -6.0 and a[..., 0].max() == 6.0


class TestTargets:
    def test_gt_on_anchor_is_positive(self):
        a = anchors_mod.generate_anchor_box(ANCHOR_ARGS, order="hwl")
        # put a GT exactly on an anchor (yaw 0 anchor at some grid point)
        gt = np.zeros((5, 7))
        gt[0] = [*a[4, 8, 0, :3], 1.56, 1.6, 3.9, 0.0]
        mask = np.zeros(5)
        mask[0] = 1
        label = targets_mod.generate_targets(gt, mask, a, 0.6, 0.45, "hwl")
        assert label["pos_equal_one"].shape == (8, 16, 2)
        assert label["pos_equal_one"].sum() >= 1
        assert label["pos_equal_one"][4, 8, 0] == 1
        # the exact-match anchor has ~zero residuals
        t = label["targets"][4, 8, 0:7]
        np.testing.assert_allclose(t, 0.0, atol=1e-6)
        # pos anchors are excluded from negatives
        assert label["neg_equal_one"][4, 8, 0] == 0

    def test_empty_gt_all_negative(self):
        a = anchors_mod.generate_anchor_box(ANCHOR_ARGS, order="hwl")
        label = targets_mod.generate_targets(
            np.zeros((5, 7)), np.zeros(5), a, 0.6, 0.45, "hwl"
        )
        assert label["pos_equal_one"].sum() == 0
        assert label["neg_equal_one"].min() == 1

    def test_encode_decode_roundtrip_via_targets(self):
        a = anchors_mod.generate_anchor_box(ANCHOR_ARGS, order="hwl")
        gt = np.zeros((2, 7))
        gt[0] = [1.1, 0.3, -0.8, 1.5, 1.7, 4.2, 0.2]
        mask = np.array([1.0, 0.0])
        label = targets_mod.generate_targets(gt, mask, a, 0.6, 0.45, "hwl")
        pos = np.argwhere(label["pos_equal_one"] > 0)
        assert len(pos) > 0
        i, j, k = pos[0]
        delta = label["targets"][i, j, k * 7 : (k + 1) * 7]
        anchor = a[i, j, k]
        rec = box_np.box_decode(delta[None], anchor[None])[0]
        np.testing.assert_allclose(rec, gt[0], atol=1e-5)


class TestDevicePostprocess:
    def _perfect_preds(self, a, gt_boxes):
        """Build head outputs that decode exactly to gt_boxes."""
        h, w, num_a, _ = a.shape
        cls = np.full((h, w, num_a), -10.0, dtype=np.float32)
        reg = np.zeros((h, w, num_a, 7), dtype=np.float32)
        dirp = np.zeros((h, w, num_a, 2), dtype=np.float32)
        flat_anchors = a.reshape(-1, 7)
        for box in gt_boxes:
            # nearest anchor with matching yaw sign
            d2 = np.sum((flat_anchors[:, :2] - box[:2]) ** 2, axis=1)
            ang = np.abs(
                np.sin(flat_anchors[:, 6] - box[6])
            )  # direction-insensitive
            idx = np.argmin(d2 + 10 * ang)
            ai, aj, ak = np.unravel_index(idx, (h, w, num_a))
            cls[ai, aj, ak] = 10.0
            reg[ai, aj, ak] = box_np.box_encode(
                box[None], flat_anchors[idx][None]
            )[0]
            # direction bin of the true yaw
            from heal_tpu.utils.common import limit_period

            bin_id = int(
                np.clip(
                    np.floor(limit_period(box[6] - 0.7853, 0, 2 * np.pi) / np.pi),
                    0,
                    1,
                )
            )
            dirp[ai, aj, ak, bin_id] = 10.0
        return cls, reg.reshape(h, w, num_a * 7), dirp.reshape(h, w, num_a * 2)

    def test_decode_recovers_gt(self):
        import jax.numpy as jnp

        from heal_tpu.postprocess.decode import post_process_single, strip_padding

        a = anchors_mod.generate_anchor_box(ANCHOR_ARGS, order="hwl")
        gt = np.array(
            [
                [1.1, 0.3, -0.8, 1.5, 1.7, 4.2, 0.2],
                [-3.0, -1.0, -1.0, 1.56, 1.6, 3.9, np.pi / 2 + 0.1],
            ]
        )
        cls, reg, dirp = self._perfect_preds(a, gt)
        out = post_process_single(
            jnp.asarray(cls),
            jnp.asarray(reg),
            jnp.asarray(dirp),
            jnp.asarray(a),
            jnp.eye(4),
            jnp.asarray([-6.4, -3.2, -3, 6.4, 3.2, 1.0]),
            max_det=32,
        )
        dense = strip_padding(out)
        assert dense["scores"].shape[0] == 2
        got = dense["boxes"][np.argsort(dense["boxes"][:, 0])]
        want = gt[np.argsort(gt[:, 0])]
        np.testing.assert_allclose(got[:, :6], want[:, :6], atol=1e-4)
        np.testing.assert_allclose(
            np.abs(np.sin(got[:, 6] - want[:, 6])), 0.0, atol=1e-4
        )

    def test_device_nms_matches_numpy(self):
        import jax.numpy as jnp

        from heal_tpu.ops.nms import nms_rotated_fixed
        from heal_tpu.utils.rotated_iou import box2d_to_corners

        rng = np.random.default_rng(7)
        n = 64
        boxes = np.stack(
            [
                rng.uniform(-20, 20, n),
                rng.uniform(-20, 20, n),
                rng.uniform(2, 5, n),
                rng.uniform(1, 2.5, n),
                rng.uniform(-np.pi, np.pi, n),
            ],
            axis=1,
        )
        scores = rng.uniform(0.2, 1.0, n)
        order = np.argsort(-scores)
        corners = box2d_to_corners(boxes)[order]
        s_sorted = scores[order]
        keep_dev = np.asarray(
            nms_rotated_fixed(
                jnp.asarray(corners),
                jnp.asarray(s_sorted),
                jnp.ones(n, dtype=bool),
                0.15,
            )
        )
        keep_np = box_np.nms_rotated(corners, s_sorted, 0.15)
        assert sorted(np.where(keep_dev)[0].tolist()) == sorted(keep_np.tolist())
