"""Numpy bounding-box geometry (host/data-pipeline side).

From-scratch implementation of the box-math capability of the reference's
``opencood/utils/box_utils.py`` (corner templates :152-206, corner_to_center
:25-87, standup boxes :226-246, encode/decode :925-1063, range masks
:384-421, nms_rotated :693-739) — same numerical conventions so that labels,
decodes, and AP matching are comparable, but vectorized and shapely-free.

Box parameterization: ``(x, y, z, d1, d2, d3, yaw)`` with ``order``:
  * ``'lwh'``: d1=length(x-extent), d2=width(y-extent), d3=height(z-extent)
  * ``'hwl'``: d1=height, d2=width, d3=length  (PointPillars convention)
Yaw rotates around +z; corners follow the CCW bottom-face template
(+,-)(+,+)(-,+)(-,-) then the top face.
"""
from __future__ import annotations

import numpy as np

from .common import rotate_points_along_z
from .rotated_iou import rotated_iou_matrix

# bottom face CCW then top face; matches reference template ordering.
CORNER_TEMPLATE = (
    np.array(
        [
            [1, -1, -1],
            [1, 1, -1],
            [-1, 1, -1],
            [-1, -1, -1],
            [1, -1, 1],
            [1, 1, 1],
            [-1, 1, 1],
            [-1, -1, 1],
        ],
        dtype=np.float64,
    )
    / 2.0
)


def _to_lwh(boxes: np.ndarray, order: str) -> np.ndarray:
    if order == "lwh":
        return boxes
    if order == "hwl":
        return boxes[:, [0, 1, 2, 5, 4, 3, 6]]
    raise ValueError(f"unknown box order {order!r}")


def boxes_to_corners_3d(boxes3d: np.ndarray, order: str) -> np.ndarray:
    """(N, 7) center boxes -> (N, 8, 3) corners."""
    boxes = _to_lwh(np.asarray(boxes3d, dtype=np.float64), order)
    corners = boxes[:, None, 3:6] * CORNER_TEMPLATE[None]
    corners = rotate_points_along_z(corners, boxes[:, 6])
    return corners + boxes[:, None, 0:3]


def boxes_to_corners2d(boxes3d: np.ndarray, order: str) -> np.ndarray:
    """(N, 7) -> (N, 4, 3): bottom-face corners."""
    return boxes_to_corners_3d(boxes3d, order)[:, :4, :]


def corners_to_standup_2d(corners: np.ndarray) -> np.ndarray:
    """(N, K, 2+) corners -> (N, 4) [x1, y1, x2, y2] axis-aligned hulls."""
    return np.stack(
        [
            corners[..., 0].min(axis=1),
            corners[..., 1].min(axis=1),
            corners[..., 0].max(axis=1),
            corners[..., 1].max(axis=1),
        ],
        axis=1,
    )


def corner_to_center(corner3d: np.ndarray, order: str = "lwh") -> np.ndarray:
    """(N, 8, 3) corners -> (N, 7) center boxes (averaging estimator).

    Same estimator as the reference (mean of face diagonals / edge pairs) so
    round-trips agree to float precision.
    """
    assert corner3d.ndim == 3
    xyz = np.mean(corner3d[:, [0, 3, 5, 6], :], axis=1)
    h = np.abs(
        np.mean(corner3d[:, 4:, 2] - corner3d[:, :4, 2], axis=1, keepdims=True)
    )

    def _d(i, j):
        return np.sqrt(
            np.sum(
                (corner3d[:, i, [0, 1]] - corner3d[:, j, [0, 1]]) ** 2,
                axis=1,
                keepdims=True,
            )
        )

    l = (_d(0, 3) + _d(2, 1) + _d(4, 7) + _d(5, 6)) / 4
    w = (_d(0, 1) + _d(2, 3) + _d(4, 5) + _d(6, 7)) / 4

    def _theta(i, j):
        return np.arctan2(
            corner3d[:, i, 1] - corner3d[:, j, 1],
            corner3d[:, i, 0] - corner3d[:, j, 0],
        )

    theta = (
        (_theta(1, 2) + _theta(0, 3) + _theta(5, 6) + _theta(4, 7))[:, None] / 4
    )

    if order == "lwh":
        return np.concatenate([xyz, l, w, h, theta], axis=1)
    if order == "hwl":
        return np.concatenate([xyz, h, w, l, theta], axis=1)
    raise ValueError(f"unknown box order {order!r}")


def standup_iou_matrix(
    boxes: np.ndarray, query: np.ndarray, plus_one: bool = True
) -> np.ndarray:
    """Axis-aligned IoU matrix, (N, 4) x (K, 4) -> (N, K).

    ``plus_one=True`` reproduces the Pascal-VOC "+1" convention of the
    reference's Cython ``bbox_overlaps`` (utils/box_overlaps.pyx) used for
    anchor target assignment.
    """
    off = 1.0 if plus_one else 0.0
    boxes = np.asarray(boxes, dtype=np.float64)
    query = np.asarray(query, dtype=np.float64)
    area_b = (boxes[:, 2] - boxes[:, 0] + off) * (boxes[:, 3] - boxes[:, 1] + off)
    area_q = (query[:, 2] - query[:, 0] + off) * (query[:, 3] - query[:, 1] + off)
    iw = (
        np.minimum(boxes[:, None, 2], query[None, :, 2])
        - np.maximum(boxes[:, None, 0], query[None, :, 0])
        + off
    )
    ih = (
        np.minimum(boxes[:, None, 3], query[None, :, 3])
        - np.maximum(boxes[:, None, 1], query[None, :, 1])
        + off
    )
    inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
    union = area_b[:, None] + area_q[None, :] - inter
    return np.where((iw > 0) & (ih > 0), inter / union, 0.0)


def polygon_iou_matrix(corners_a: np.ndarray, corners_b: np.ndarray) -> np.ndarray:
    """Rotated-rect IoU matrix from BEV corners.

    Accepts (N, 4, 2), (N, 4, 3) or (N, 8, 3) corner sets; only the first
    four corners' xy are used (same as the reference's shapely conversion,
    common_utils.convert_format).
    """
    ca = np.asarray(corners_a, dtype=np.float64)[:, :4, :2]
    cb = np.asarray(corners_b, dtype=np.float64)[:, :4, :2]
    if ca.shape[0] == 0 or cb.shape[0] == 0:
        return np.zeros((ca.shape[0], cb.shape[0]))
    return rotated_iou_matrix(ca, cb, np)


def nms_rotated(corners: np.ndarray, scores: np.ndarray, threshold: float,
                top: int = 1000) -> np.ndarray:
    """Greedy rotated NMS over BEV corners; returns kept indices.

    Host-side equivalent of reference box_utils.nms_rotated:693 (the device
    path lives in heal_tpu.ops.nms).
    """
    n = corners.shape[0]
    if n == 0:
        return np.array([], dtype=np.int32)
    order = np.argsort(-scores)[:top]
    iou = polygon_iou_matrix(corners[order], corners[order])
    keep_mask = np.ones(len(order), dtype=bool)
    pick = []
    for i in range(len(order)):
        if not keep_mask[i]:
            continue
        pick.append(order[i])
        keep_mask &= iou[i] <= threshold
        keep_mask[i] = False
    return np.array(pick, dtype=np.int32)


def mask_boxes_outside_range(
    boxes: np.ndarray,
    limit_range,
    order: str | None,
    min_num_corners: int = 8,
    return_mask: bool = False,
):
    """Keep boxes with >= min_num_corners corners inside the xyz range.

    ``boxes`` may be (N, 7) centers (converted with ``order``) or (N, 8, 3)
    corners already.
    """
    boxes = np.asarray(boxes)
    corners = boxes if boxes.ndim == 3 else boxes_to_corners_3d(boxes, order)
    limit = np.asarray(limit_range, dtype=np.float64)
    inside = (corners >= limit[0:3]) & (corners <= limit[3:6])
    mask = inside.all(axis=2).sum(axis=1) >= min_num_corners
    if return_mask:
        return boxes[mask], mask
    return boxes[mask]


def remove_large_boxes(corners: np.ndarray, max_len: float = 6.0) -> np.ndarray:
    """Keep-mask for boxes whose BEV extent is plausibly a vehicle.

    Reference remove_large_pred_bbx (box_utils.py:840) checks x/y extents
    <= 6 m (its z check degenerates to y_len != 0; we keep the effective
    behavior: x and y extents bounded and non-degenerate).
    """
    x_len = corners[:, :, 0].max(axis=1) - corners[:, :, 0].min(axis=1)
    y_len = corners[:, :, 1].max(axis=1) - corners[:, :, 1].min(axis=1)
    return (x_len <= max_len) & (y_len <= max_len) & (y_len > 0)


def remove_abnormal_z_boxes(
    corners: np.ndarray, z_min: float = -3.0, z_max: float = 1.0
) -> np.ndarray:
    """Keep-mask for boxes within a sane z band (ref box_utils.py:872)."""
    return (corners[:, :, 2].min(axis=1) >= z_min) & (
        corners[:, :, 2].max(axis=1) <= z_max
    )


def project_points(points: np.ndarray, tfm: np.ndarray) -> np.ndarray:
    """Apply a 4x4 homogeneous transform to (N, 3) points."""
    homo = np.concatenate([points, np.ones((points.shape[0], 1))], axis=1)
    return (homo @ tfm.T)[:, :3]


def project_box3d(corners3d: np.ndarray, tfm: np.ndarray) -> np.ndarray:
    """Transform (N, 8, 3) corners with a 4x4 matrix."""
    n = corners3d.shape[0]
    flat = corners3d.reshape(-1, 3)
    return project_points(flat, tfm).reshape(n, 8, 3)


def box_encode(boxes: np.ndarray, anchors: np.ndarray) -> np.ndarray:
    """VoxelNet-style residual encoding; boxes/anchors (N, 7) in hwl order.

    dx, dy normalized by anchor BEV diagonal; dz by anchor height (index 3
    in hwl); dims by log-ratio; yaw by difference. Matches reference
    generate_label math (voxel_postprocessor.py:85-207).
    """
    d = np.sqrt(anchors[:, 4] ** 2 + anchors[:, 5] ** 2)
    out = np.empty_like(boxes)
    out[:, 0] = (boxes[:, 0] - anchors[:, 0]) / d
    out[:, 1] = (boxes[:, 1] - anchors[:, 1]) / d
    out[:, 2] = (boxes[:, 2] - anchors[:, 2]) / anchors[:, 3]
    out[:, 3:6] = np.log(boxes[:, 3:6] / anchors[:, 3:6])
    out[:, 6] = boxes[:, 6] - anchors[:, 6]
    return out


def box_decode(deltas: np.ndarray, anchors: np.ndarray) -> np.ndarray:
    """Inverse of :func:`box_encode` (ref delta_to_boxes3d semantics)."""
    d = np.sqrt(anchors[:, 4] ** 2 + anchors[:, 5] ** 2)
    out = np.empty_like(deltas)
    out[:, 0] = deltas[:, 0] * d + anchors[:, 0]
    out[:, 1] = deltas[:, 1] * d + anchors[:, 1]
    out[:, 2] = deltas[:, 2] * anchors[:, 3] + anchors[:, 2]
    out[:, 3:6] = np.exp(deltas[:, 3:6]) * anchors[:, 3:6]
    out[:, 6] = deltas[:, 6] + anchors[:, 6]
    return out


def camera_visible_mask(boxes: np.ndarray, visibility_map: np.ndarray):
    """Which boxes a camera rig can see, per the ego BEV visibility map.

    Vectorization of the reference's box_is_visible
    (box_utils.py:1236-1266): the map is 256x256 at 0.39 m/pixel,
    ego-centered, heading up (py = 127 - x/0.39, px = 127 + y/0.39);
    a box is visible iff the map is non-zero at its center cell.
    boxes: (N, >=2) with ego-frame x, y in the first two columns.
    """
    if len(boxes) == 0:
        return np.zeros(0, dtype=bool)
    x = boxes[:, 0]
    y = boxes[:, 1]
    py = 127 - (x / 0.39).astype(np.int64)
    px = 127 + (y / 0.39).astype(np.int64)
    h, w = visibility_map.shape[:2]
    inside = (py >= 0) & (py < h) & (px >= 0) & (px < w)
    vis = np.zeros(len(boxes), dtype=bool)
    vis[inside] = visibility_map[py[inside], px[inside]] > 0
    return vis
