import numpy as np
import pytest

from heal_tpu.utils import box_np
from heal_tpu.utils.rotated_iou import box2d_to_corners, rotated_iou_matrix


def make_boxes(n, rng, order="lwh"):
    boxes = np.zeros((n, 7))
    boxes[:, 0:2] = rng.uniform(-50, 50, size=(n, 2))
    boxes[:, 2] = rng.uniform(-2, 0, size=n)
    dims = rng.uniform(1.0, 5.0, size=(n, 3))
    if order == "lwh":
        boxes[:, 3:6] = dims
    else:
        boxes[:, 3:6] = dims[:, ::-1]
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, size=n)
    return boxes


class TestCorners:
    def test_axis_aligned_corners(self):
        box = np.array([[1.0, 2.0, 0.5, 4.0, 2.0, 1.5, 0.0]])  # lwh
        corners = box_np.boxes_to_corners_3d(box, "lwh")
        assert corners.shape == (1, 8, 3)
        np.testing.assert_allclose(corners[0, 0], [3.0, 1.0, -0.25])
        np.testing.assert_allclose(corners[0, 6], [-1.0, 3.0, 1.25])
        # bottom face CCW
        from heal_tpu.utils.rotated_iou import polygon_area

        assert polygon_area(corners[0, :4, :2]) > 0

    def test_hwl_equivalence(self):
        rng = np.random.default_rng(0)
        lwh = make_boxes(10, rng, "lwh")
        hwl = lwh[:, [0, 1, 2, 5, 4, 3, 6]]
        np.testing.assert_allclose(
            box_np.boxes_to_corners_3d(lwh, "lwh"),
            box_np.boxes_to_corners_3d(hwl, "hwl"),
        )

    def test_corner_center_roundtrip(self):
        rng = np.random.default_rng(1)
        boxes = make_boxes(20, rng, "lwh")
        corners = box_np.boxes_to_corners_3d(boxes, "lwh")
        rec = box_np.corner_to_center(corners, "lwh")
        np.testing.assert_allclose(rec[:, :6], boxes[:, :6], atol=1e-6)
        # yaw may differ by 2pi wraps; compare as sin/cos
        np.testing.assert_allclose(np.sin(rec[:, 6]), np.sin(boxes[:, 6]), atol=1e-6)
        np.testing.assert_allclose(np.cos(rec[:, 6]), np.cos(boxes[:, 6]), atol=1e-6)


class TestRotatedIoU:
    def test_identical(self):
        b = np.array([[0.0, 0.0, 4.0, 2.0, 0.3]])
        c = box2d_to_corners(b)
        iou = rotated_iou_matrix(c, c)
        np.testing.assert_allclose(iou, [[1.0]], atol=1e-6)

    def test_disjoint(self):
        a = box2d_to_corners(np.array([[0.0, 0.0, 2.0, 2.0, 0.0]]))
        b = box2d_to_corners(np.array([[10.0, 0.0, 2.0, 2.0, 1.0]]))
        np.testing.assert_allclose(rotated_iou_matrix(a, b), [[0.0]], atol=1e-9)

    def test_axis_aligned_overlap(self):
        a = box2d_to_corners(np.array([[0.0, 0.0, 2.0, 2.0, 0.0]]))
        b = box2d_to_corners(np.array([[1.0, 0.0, 2.0, 2.0, 0.0]]))
        # intersection 1x2=2, union 4+4-2=6
        np.testing.assert_allclose(rotated_iou_matrix(a, b), [[2 / 6]], atol=1e-6)

    def test_rotated_45_cross(self):
        # unit square vs itself rotated by 45 deg: known IoU
        a = box2d_to_corners(np.array([[0.0, 0.0, 1.0, 1.0, 0.0]]))
        b = box2d_to_corners(np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]]))
        inter = 4 * (np.sqrt(2) - 1) / 2 * (2 - np.sqrt(2)) / 2 * 2  # octagon
        # octagon area = 2*(sqrt(2)-1) for unit squares at 45deg
        expected_inter = 2 * (np.sqrt(2) - 1)
        expected = expected_inter / (2 - expected_inter)
        np.testing.assert_allclose(
            rotated_iou_matrix(a, b), [[expected]], atol=1e-5
        )

    def test_containment(self):
        a = box2d_to_corners(np.array([[0.0, 0.0, 4.0, 4.0, 0.7]]))
        b = box2d_to_corners(np.array([[0.0, 0.0, 2.0, 2.0, 0.2]]))
        np.testing.assert_allclose(rotated_iou_matrix(a, b), [[4 / 16]], atol=1e-5)

    def test_against_monte_carlo_random(self):
        """Cross-check the analytic intersection against MC point sampling."""
        rng = np.random.default_rng(42)
        n = 12
        boxes_a = np.stack(
            [
                rng.uniform(-2, 2, n),
                rng.uniform(-2, 2, n),
                rng.uniform(0.5, 6, n),
                rng.uniform(0.5, 6, n),
                rng.uniform(-np.pi, np.pi, n),
            ],
            axis=1,
        )
        boxes_b = boxes_a[rng.permutation(n)] + rng.normal(0, 0.8, (n, 5))
        boxes_b[:, 2:4] = np.abs(boxes_b[:, 2:4]) + 0.5
        ca, cb = box2d_to_corners(boxes_a), box2d_to_corners(boxes_b)
        ours = rotated_iou_matrix(ca, cb)

        pts = rng.uniform(-8, 8, size=(200_000, 2))

        def inside(boxes5):
            rel = pts[None, :, :] - boxes5[:, None, :2]
            c, s = np.cos(boxes5[:, 4]), np.sin(boxes5[:, 4])
            lx = rel[..., 0] * c[:, None] + rel[..., 1] * s[:, None]
            ly = -rel[..., 0] * s[:, None] + rel[..., 1] * c[:, None]
            return (np.abs(lx) <= boxes5[:, None, 2] / 2) & (
                np.abs(ly) <= boxes5[:, None, 3] / 2
            )

        in_a, in_b = inside(boxes_a), inside(boxes_b)
        cell = (16.0 * 16.0) / pts.shape[0]
        for i in range(n):
            for j in range(n):
                inter = (in_a[i] & in_b[j]).sum() * cell
                union = (in_a[i] | in_b[j]).sum() * cell
                ref = inter / max(union, 1e-12)
                assert abs(ours[i, j] - ref) < 0.02, (i, j, ours[i, j], ref)


class TestStandupIoU:
    def test_plus_one_convention(self):
        a = np.array([[0.0, 0.0, 10.0, 10.0]])
        iou = box_np.standup_iou_matrix(a, a, plus_one=True)
        np.testing.assert_allclose(iou, [[1.0]])
        b = np.array([[5.0, 0.0, 15.0, 10.0]])
        # with +1: inter = 6*11, each area = 11*11, union = 2*121-66
        expected = 66.0 / (242.0 - 66.0)
        np.testing.assert_allclose(box_np.standup_iou_matrix(a, b), [[expected]])

    def test_no_plus_one(self):
        a = np.array([[0.0, 0.0, 2.0, 2.0]])
        b = np.array([[1.0, 0.0, 3.0, 2.0]])
        np.testing.assert_allclose(
            box_np.standup_iou_matrix(a, b, plus_one=False), [[2 / 6]]
        )


class TestCodec:
    def test_encode_decode_roundtrip(self):
        rng = np.random.default_rng(3)
        boxes = make_boxes(15, rng, "hwl")
        anchors = make_boxes(15, rng, "hwl")
        deltas = box_np.box_encode(boxes, anchors)
        rec = box_np.box_decode(deltas, anchors)
        np.testing.assert_allclose(rec, boxes, atol=1e-9)


class TestNMS:
    def test_suppresses_duplicates(self):
        boxes5 = np.array(
            [
                [0.0, 0.0, 4.0, 2.0, 0.1],
                [0.05, 0.0, 4.0, 2.0, 0.1],  # near-duplicate
                [20.0, 0.0, 4.0, 2.0, 0.5],
            ]
        )
        corners = box2d_to_corners(boxes5)
        scores = np.array([0.9, 0.8, 0.7])
        keep = box_np.nms_rotated(corners, scores, threshold=0.15)
        assert sorted(keep.tolist()) == [0, 2]

    def test_empty(self):
        assert box_np.nms_rotated(np.zeros((0, 4, 2)), np.zeros(0), 0.15).size == 0


class TestRangeMask:
    def test_mask(self):
        boxes = np.array(
            [[0, 0, 0, 2.0, 2.0, 2.0, 0.0], [200, 0, 0, 2.0, 2.0, 2.0, 0.0]]
        )
        kept, mask = box_np.mask_boxes_outside_range(
            boxes, [-100, -100, -5, 100, 100, 5], "lwh", return_mask=True
        )
        assert mask.tolist() == [True, False]
