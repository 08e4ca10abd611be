"""Anchor target assignment (host-side, vectorized numpy).

Same assignment semantics as reference VoxelPostprocessor.generate_label
(voxel_postprocessor.py:85-207):
  * IoU between anchor and GT *standup* (axis-aligned hull) BEV boxes,
    computed with the Pascal-VOC "+1" convention of the Cython
    ``bbox_overlaps`` it calls;
  * positives: IoU > pos_threshold, plus the highest-IoU anchor per GT
    (force-matched even below threshold, if IoU > 0);
  * negatives: anchors whose IoU with every GT < neg_threshold, minus
    force-matched ones;
  * regression targets: VoxelNet residual encoding vs the matched anchor.

The O(anchors × GT) IoU matrix replaces the Cython loop.
"""
from __future__ import annotations

import numpy as np

from ..utils import box_np


def generate_targets(
    gt_box_center: np.ndarray,
    mask: np.ndarray,
    anchors: np.ndarray,
    pos_threshold: float,
    neg_threshold: float,
    order: str = "hwl",
) -> dict:
    """Build dense training targets.

    Parameters
    ----------
    gt_box_center : (max_num, 7) padded GT boxes in ``order``.
    mask : (max_num,) 1 for real boxes.
    anchors : (H, W, num_anchor, 7) from generate_anchor_box.

    Returns dict with pos_equal_one/neg_equal_one (H, W, A) and targets
    (H, W, A*7).
    """
    assert order == "hwl", "target assignment follows the hwl convention"
    feature_shape = anchors.shape[:2]
    num_anchor = anchors.shape[2]
    anchors_flat = anchors.reshape(-1, 7)
    # anchor BEV diagonal (w, l at indices 4, 5 in hwl)
    anchors_d = np.sqrt(anchors_flat[:, 4] ** 2 + anchors_flat[:, 5] ** 2)

    pos_equal_one = np.zeros((*feature_shape, num_anchor), dtype=np.float32)
    neg_equal_one = np.zeros((*feature_shape, num_anchor), dtype=np.float32)
    targets = np.zeros((*feature_shape, num_anchor * 7), dtype=np.float32)

    gt_valid = gt_box_center[mask == 1]
    if gt_valid.shape[0] == 0:
        neg_equal_one[...] = 1.0
        return {
            "pos_equal_one": pos_equal_one,
            "neg_equal_one": neg_equal_one,
            "targets": targets,
        }

    gt_corners = box_np.boxes_to_corners_3d(gt_valid, order)
    anchor_corners = box_np.boxes_to_corners_3d(anchors_flat, order)
    anchor_standup = box_np.corners_to_standup_2d(anchor_corners[:, :4, :])
    gt_standup = box_np.corners_to_standup_2d(gt_corners[:, :4, :])

    # (num_anchors, num_gt), +1 convention as the reference's Cython
    # kernel; C++ fast path when the native lib is built
    from .. import native

    iou = native.bbox_overlaps(
        anchor_standup.astype(np.float32),
        gt_standup.astype(np.float32),
        plus_one=True,
    )

    # highest-IoU anchor per GT (force match when IoU > 0)
    id_highest = np.argmax(iou, axis=0)  # (num_gt,)
    id_highest_gt = np.arange(iou.shape[1])
    keep = iou[id_highest, id_highest_gt] > 0
    id_highest, id_highest_gt = id_highest[keep], id_highest_gt[keep]

    id_pos, id_pos_gt = np.where(iou > pos_threshold)
    id_neg = np.where((iou < neg_threshold).all(axis=1))[0]

    id_pos = np.concatenate([id_pos, id_highest])
    id_pos_gt = np.concatenate([id_pos_gt, id_highest_gt])
    id_pos, index = np.unique(id_pos, return_index=True)
    id_pos_gt = id_pos_gt[index]

    ix, iy, iz = np.unravel_index(id_pos, (*feature_shape, num_anchor))
    pos_equal_one[ix, iy, iz] = 1

    # residual encoding (gt vs matched anchor); gt_box_center indexed with
    # original (padded) ids — mask==1 boxes are a prefix in our datasets,
    # but support arbitrary mask placement by compacting first:
    gt_compact = gt_valid
    deltas = np.zeros((len(id_pos), 7), dtype=np.float64)
    a = anchors_flat[id_pos]
    g = gt_compact[id_pos_gt]
    d = anchors_d[id_pos]
    deltas[:, 0] = (g[:, 0] - a[:, 0]) / d
    deltas[:, 1] = (g[:, 1] - a[:, 1]) / d
    deltas[:, 2] = (g[:, 2] - a[:, 2]) / a[:, 3]
    deltas[:, 3:6] = np.log(g[:, 3:6] / a[:, 3:6])
    deltas[:, 6] = g[:, 6] - a[:, 6]
    for k in range(7):
        targets[ix, iy, iz * 7 + k] = deltas[:, k]

    ix, iy, iz = np.unravel_index(id_neg, (*feature_shape, num_anchor))
    neg_equal_one[ix, iy, iz] = 1
    # anchors force-matched to a GT are never negative
    ix, iy, iz = np.unravel_index(id_highest, (*feature_shape, num_anchor))
    neg_equal_one[ix, iy, iz] = 0

    return {
        "pos_equal_one": pos_equal_one,
        "neg_equal_one": neg_equal_one,
        "targets": targets,
    }


def gaussian_radius(h: float, w: float, min_overlap: float = 0.5) -> float:
    """CornerNet-style radius so boxes IoU>=min_overlap still hit."""
    a1, b1 = 1, h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 - np.sqrt(max(b1**2 - 4 * a1 * c1, 0))) / 2
    a2, b2 = 4, 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    r2 = (b2 - np.sqrt(max(b2**2 - 4 * a2 * c2, 0))) / 2
    a3, b3 = 4 * min_overlap, -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    r3 = (b3 + np.sqrt(max(b3**2 - 4 * a3 * c3, 0))) / 2
    return max(min(r1, r2, r3), 0)


def generate_center_targets(
    gt_box_center: np.ndarray,
    mask: np.ndarray,
    grid_hw: tuple,
    lidar_range,
    stride_m: float,
    order: str = "hwl",
) -> dict:
    """Anchor-free CenterPoint targets (capability of reference
    center_point target assignment in loss/center_point_loss.py):
    per-cell gaussian heatmap + direct box regression at centers.

    Returns heatmap (H, W, 1), box_targets (H, W, 7), reg_mask (H, W).
    """
    h, w = grid_hw
    heatmap = np.zeros((h, w, 1), np.float32)
    boxes = np.zeros((h, w, 7), np.float32)
    reg_mask = np.zeros((h, w), np.float32)
    x0, y0 = lidar_range[0], lidar_range[1]
    gt = gt_box_center[mask == 1]
    for box in gt:
        cx = (box[0] - x0) / stride_m
        cy = (box[1] - y0) / stride_m
        if not (0 <= cx < w and 0 <= cy < h):
            continue
        # BEV dims: order hwl -> l at 5, w at 4
        bl = box[5] / stride_m
        bw = box[4] / stride_m
        radius = max(int(gaussian_radius(bw, bl)), 1)
        ci, cj = int(cy), int(cx)
        ys, xs = np.ogrid[-radius : radius + 1, -radius : radius + 1]
        g = np.exp(-(xs * xs + ys * ys) / (2 * (radius / 3 + 1e-6) ** 2))
        t, b = max(0, ci - radius), min(h, ci + radius + 1)
        l_, r = max(0, cj - radius), min(w, cj + radius + 1)
        gt_, gb = radius - (ci - t), radius + (b - ci)
        gl, gr = radius - (cj - l_), radius + (r - cj)
        heatmap[t:b, l_:r, 0] = np.maximum(
            heatmap[t:b, l_:r, 0], g[gt_:gb, gl:gr]
        )
        boxes[ci, cj] = box
        reg_mask[ci, cj] = 1.0
    return {"heatmap": heatmap, "box_targets": boxes, "reg_mask": reg_mask}


# PIXOR dense label map (ref data_utils/post_processor/bev_postprocessor.py
# :34-163). Hard-coded normalization constants are the reference's
# (bev_postprocessor.py:28-29).
PIXOR_TARGET_MEAN = np.array(
    [0.008, 0.001, 0.202, 0.2, 0.43, 1.368], np.float64
)
PIXOR_TARGET_STD = np.array(
    [0.866, 0.5, 0.954, 0.668, 0.09, 0.111], np.float64
)


def generate_pixor_label_map(
    gt_box_center: np.ndarray,
    mask: np.ndarray,
    lidar_range,
    res: float,
    downsample_rate: int,
    label_shape,
    order: str = "lwh",
) -> np.ndarray:
    """PIXOR dense (H, W, 7) label map: per-pixel objectness + normalized
    (cos yaw, sin yaw, dx, dy, log w, log l) regression targets.

    Semantics of reference ``BevPostprocessor.generate_label`` /
    ``update_label_map`` (bev_postprocessor.py:34-163): for every pixel
    of the downsampled label grid that falls inside a GT box's rotated
    BEV footprint, channel 0 is 1 and channels 1-6 carry the box's
    regression target relative to the pixel's continuous lidar-frame
    position, normalized by the fixed target mean/std. Returns NHWC-style
    (H, W, 7) with H along lidar x (the reference transposes to CHW at
    the end; we keep HWC).
    """
    h, w, _ = label_shape
    label_map = np.zeros((h, w, 7), np.float64)

    def _normalized(lm):
        # ref normalize_targets (:146-163) normalizes channels 1-6 of
        # EVERY pixel, background included
        lm = lm.copy()
        lm[..., 1:] = (lm[..., 1:] - PIXOR_TARGET_MEAN) / PIXOR_TARGET_STD
        return lm.astype(np.float32)

    gt = np.asarray(gt_box_center, np.float64)[np.asarray(mask) == 1]
    if len(gt) == 0:
        return _normalized(label_map)

    corners = box_np.boxes_to_corners2d(gt, order)[:, :, :2]  # (n, 4, 2)
    yaw = gt[:, -1]
    # (n, 6): cos, sin, x, y, dx, dy — dims are the box's columns 3/4
    # verbatim (l, w under lwh order; bev_postprocessor.py:66-69)
    reg = np.column_stack(
        [np.cos(yaw), np.sin(yaw), gt[:, 0], gt[:, 1], gt[:, 3], gt[:, 4]]
    )

    origin = np.array([lidar_range[0], lidar_range[1]], np.float64)
    cell = res * downsample_rate
    corners_px = (corners - origin) / cell  # pixel coords

    # pixel grid: index 0 along lidar-x (rows), index 1 along lidar-y —
    # the reference's meshgrid(x, y) + column_stack yields the same
    # (x_pix, y_pix) pairs
    xx, yy = np.meshgrid(np.arange(h), np.arange(w))
    pix = np.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1).astype(
        np.float64
    )  # (P, 2)

    for i in range(len(gt)):
        c = corners_px[i]
        e1 = c[1] - c[0]
        e2 = c[3] - c[0]
        rel = pix - c[0]
        l1 = rel @ e1 / max(e1 @ e1, 1e-12)
        l2 = rel @ e2 / max(e2 @ e2, 1e-12)
        inside = (l1 >= 0) & (l1 <= 1) & (l2 >= 0) & (l2 <= 1)
        pin = pix[inside]
        if len(pin) == 0:
            continue
        # pixel -> continuous lidar-frame coords (dist_to_continuous)
        cont = pin * cell + origin
        t = np.repeat(reg[i : i + 1], len(pin), axis=0)
        t[:, 2:4] -= cont
        t[:, 4:] = np.log(t[:, 4:])
        ij = pin.astype(np.int64)
        label_map[ij[:, 0], ij[:, 1], 0] = 1.0
        label_map[ij[:, 0], ij[:, 1], 1:] = t
    return _normalized(label_map)
