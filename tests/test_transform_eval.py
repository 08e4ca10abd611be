import numpy as np

from heal_tpu.utils import box_np, eval_np, transform_np
from heal_tpu.utils.rotated_iou import box2d_to_corners


class TestTransforms:
    def test_x_to_world_identity(self):
        np.testing.assert_allclose(
            transform_np.x_to_world([0, 0, 0, 0, 0, 0]), np.eye(4)
        )

    def test_yaw_only(self):
        t = transform_np.x_to_world([1, 2, 3, 0, 90, 0])
        np.testing.assert_allclose(t[:3, 3], [1, 2, 3])
        np.testing.assert_allclose(
            t[:3, :3], [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-12
        )

    def test_pose_roundtrip(self):
        pose = [3.0, -2.0, 1.0, 10.0, 35.0, -5.0]
        t = transform_np.x_to_world(pose)
        rec = transform_np.tfm_to_pose(t)
        np.testing.assert_allclose(rec, pose, atol=1e-9)

    def test_x1_to_x2_inverse_consistency(self):
        p1 = [5.0, 1.0, 0.0, 0.0, 30.0, 0.0]
        p2 = [-2.0, 4.0, 0.5, 5.0, -60.0, 2.0]
        t12 = transform_np.x1_to_x2(p1, p2)
        t21 = transform_np.x1_to_x2(p2, p1)
        np.testing.assert_allclose(t12 @ t21, np.eye(4), atol=1e-10)

    def test_point_mapping(self):
        # a point at origin of frame1 maps to frame1's position in frame2
        p1 = [10.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        p2 = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        t = transform_np.x1_to_x2(p1, p2)
        out = box_np.project_points(np.zeros((1, 3)), t)
        np.testing.assert_allclose(out, [[10.0, 0.0, 0.0]], atol=1e-12)

    def test_pairwise(self):
        poses = [[0, 0, 0, 0, 0, 0], [10, 0, 0, 0, 90, 0]]
        pw = transform_np.get_pairwise_transformation(poses, max_cav=5)
        assert pw.shape == (5, 5, 4, 4)
        np.testing.assert_allclose(pw[0, 0], np.eye(4))
        np.testing.assert_allclose(pw[3, 4], np.eye(4))  # padded slots identity
        # agent1 origin expressed in agent0 frame = (10, 0)
        out = box_np.project_points(np.zeros((1, 3)), pw[1, 0])
        np.testing.assert_allclose(out, [[10.0, 0.0, 0.0]], atol=1e-12)

    def test_normalize_pairwise_identity(self):
        pw = np.tile(np.eye(4), (1, 2, 2, 1, 1))
        aff = transform_np.normalize_pairwise_tfm(pw, 100, 252, 0.4)
        assert aff.shape == (1, 2, 2, 2, 3)
        np.testing.assert_allclose(aff[0, 0, 0], [[1, 0, 0], [0, 1, 0]])


class TestEval:
    def _corners(self, centers):
        n = len(centers)
        boxes = np.zeros((n, 5))
        boxes[:, :2] = centers
        boxes[:, 2:4] = [4.0, 2.0]
        return box2d_to_corners(boxes)

    def test_perfect_detection(self):
        stat = eval_np.new_result_stat((0.5,))
        gt = self._corners([[0, 0], [10, 10]])
        eval_np.calculate_tp_fp(gt, np.array([0.9, 0.8]), gt, stat, 0.5)
        ap, _, _ = eval_np.calculate_ap(stat, 0.5)
        assert ap == 1.0

    def test_false_positive_lowers_ap(self):
        stat = eval_np.new_result_stat((0.5,))
        gt = self._corners([[0, 0]])
        det = self._corners([[0, 0], [50, 50]])
        eval_np.calculate_tp_fp(det, np.array([0.9, 0.95]), gt, stat, 0.5)
        ap, _, _ = eval_np.calculate_ap(stat, 0.5)
        assert 0.0 < ap < 1.0

    def test_missed_gt(self):
        stat = eval_np.new_result_stat((0.5,))
        gt = self._corners([[0, 0], [30, 30]])
        det = self._corners([[0, 0]])
        eval_np.calculate_tp_fp(det, np.array([0.9]), gt, stat, 0.5)
        ap, _, _ = eval_np.calculate_ap(stat, 0.5)
        np.testing.assert_allclose(ap, 0.5)

    def test_no_detections(self):
        stat = eval_np.new_result_stat((0.5,))
        eval_np.calculate_tp_fp(None, None, self._corners([[0, 0]]), stat, 0.5)
        ap, _, _ = eval_np.calculate_ap(stat, 0.5)
        assert ap == 0.0

    def test_greedy_match_removes_gt(self):
        # two dets on same gt: second is FP
        stat = eval_np.new_result_stat((0.5,))
        gt = self._corners([[0, 0]])
        det = self._corners([[0, 0], [0.1, 0]])
        eval_np.calculate_tp_fp(det, np.array([0.9, 0.8]), gt, stat, 0.5)
        assert stat[0.5]["tp"] == [1, 0]
        assert stat[0.5]["fp"] == [0, 1]
