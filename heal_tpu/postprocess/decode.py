"""Inference post-processing pipeline (jit-able, fixed shapes).

Device equivalent of reference VoxelPostprocessor.post_process
(voxel_postprocessor.py:245-405): sigmoid score -> threshold -> residual
decode -> direction correction -> project to ego -> sanity filters
(extent / z band) -> rotated NMS -> range mask. Instead of ragged
masked_select/indexing, everything is computed over a fixed top-K candidate
set with a validity mask; hosts strip padding after device->host transfer.

Prediction layout is NHWC (TPU-native): cls (B, H, W, A),
reg (B, H, W, A*7), dir (B, H, W, A*num_bins).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry
from ..ops.nms import nms_rotated_fixed


@partial(
    jax.jit,
    static_argnames=(
        "order",
        "score_threshold",
        "nms_threshold",
        "max_det",
        "dir_offset",
        "num_bins",
        "anchor_free",
    ),
)
def post_process_single(
    cls_preds: jnp.ndarray,
    reg_preds: jnp.ndarray,
    dir_preds: jnp.ndarray | None,
    anchors: jnp.ndarray,
    transformation_matrix: jnp.ndarray,
    gt_range: jnp.ndarray,
    order: str = "hwl",
    score_threshold: float = 0.2,
    nms_threshold: float = 0.15,
    max_det: int = 300,
    dir_offset: float = 0.7853,
    num_bins: int = 2,
    anchor_free: bool = False,
    unc_preds: jnp.ndarray | None = None,
):
    """Decode one sample's head outputs into padded detections.

    Parameters
    ----------
    cls_preds : (H, W, A) logits.
    reg_preds : (H, W, A*7) residuals.
    dir_preds : (H, W, A*num_bins) logits or None.
    anchors : (H, W, A, 7) hwl anchors.
    transformation_matrix : (4, 4) to ego frame (identity for ego).
    gt_range : (6,) xyzxyz eval range mask.

    Returns dict: corners (max_det, 8, 3) in ego frame, scores (max_det,),
    boxes (max_det, 7), valid (max_det,) bool.
    """
    h, w, a = cls_preds.shape
    n = h * w * a
    prob = jax.nn.sigmoid(cls_preds.reshape(n))
    deltas = reg_preds.reshape(n, 7)

    if anchor_free:
        # CenterPoint-style: the regression head IS the box (ref
        # voxel_postprocessor.post_process anchor-free branch)
        boxes = deltas
    else:
        anchors_flat = anchors.reshape(n, 7)
        boxes = geometry.decode_boxes(deltas, anchors_flat)  # (N, 7) hwl

    if dir_preds is not None:
        dir_logits = dir_preds.reshape(n, num_bins)
        dir_labels = jnp.argmax(dir_logits, axis=-1)
        yaw = geometry.correct_direction(
            boxes[:, 6], dir_labels, dir_offset, num_bins
        )
        boxes = boxes.at[:, 6].set(yaw)

    score_valid = prob > score_threshold
    cand_scores = jnp.where(score_valid, prob, 0.0)
    top_scores, top_idx = jax.lax.top_k(cand_scores, max_det)
    top_boxes = boxes[top_idx]
    top_valid = top_scores > score_threshold

    corners = geometry.boxes_to_corners_3d(top_boxes, order)  # (K, 8, 3)
    corners = geometry.project_corners(corners, transformation_matrix)

    # extent sanity (ref remove_large_pred_bbx) + z band (remove_bbx_abnormal_z)
    x_len = corners[..., 0].max(-1) - corners[..., 0].min(-1)
    y_len = corners[..., 1].max(-1) - corners[..., 1].min(-1)
    z_lo = corners[..., 2].min(-1)
    z_hi = corners[..., 2].max(-1)
    sane = (x_len <= 6.0) & (y_len <= 6.0) & (z_lo >= -3.0) & (z_hi <= 1.0)

    # range mask: all 8 corners inside gt_range (ref min_num_corners=8)
    inside = (
        (corners >= gt_range[0:3]) & (corners <= gt_range[3:6])
    ).all(-1).all(-1)

    valid = top_valid & sane & inside
    keep = nms_rotated_fixed(
        corners[:, :4, :2], top_scores, valid, nms_threshold
    )
    out = {
        "corners": corners,
        "scores": jnp.where(keep, top_scores, 0.0),
        "boxes": top_boxes,
        "valid": keep,
    }
    if unc_preds is not None:
        # per-box aleatoric uncertainty export (log-var x/y + log-kappa
        # yaw), used to weight box-align landmarks — ref
        # uncertainty_voxel_postprocessor.post_process_stage1(:32-113)
        udim = unc_preds.size // n
        out["uncertainty"] = unc_preds.reshape(n, udim)[top_idx]
    return out


def decode_stage2(
    rois: jnp.ndarray,
    valid: jnp.ndarray,
    rcnn_cls: jnp.ndarray,
    rcnn_reg: jnp.ndarray,
    gt_range: jnp.ndarray,
    score_threshold: float = 0.2,
    nms_threshold: float = 0.15,
):
    """Decode FPV-RCNN second-stage refinements into final detections.

    rois (R, 7) hwl ego-frame fused proposals; rcnn_cls (R,) quality
    logits; rcnn_reg (R, 7) roi-frame residuals in the convention of
    losses/fpvrcnn_loss.py (xyz / [diag, diag, h], log-dim ratio, yaw
    delta — ref sub_modules/roi_head.assign_targets + matcher decode).
    Returns the same padded det dict as post_process_single.
    """
    scores = jax.nn.sigmoid(rcnn_cls) * valid.astype(rcnn_cls.dtype)
    diag = jnp.sqrt(rois[:, 4] ** 2 + rois[:, 5] ** 2)
    scale = jnp.stack([diag, diag, rois[:, 3]], axis=-1)
    xyz = rois[:, :3] + rcnn_reg[:, :3] * jnp.maximum(scale, 1e-3)
    dims = rois[:, 3:6] * jnp.exp(jnp.clip(rcnn_reg[:, 3:6], -4.0, 4.0))
    yaw = rois[:, 6:7] + rcnn_reg[:, 6:7]
    boxes = jnp.concatenate([xyz, dims, yaw], axis=-1)  # (R, 7) hwl

    corners = geometry.boxes_to_corners_3d(boxes, "hwl")
    inside = (
        (corners >= gt_range[0:3]) & (corners <= gt_range[3:6])
    ).all(-1).all(-1)
    ok = valid & inside & (scores > score_threshold)

    order = jnp.argsort(-jnp.where(ok, scores, 0.0))
    corners = corners[order]
    scores_s = jnp.where(ok, scores, 0.0)[order]
    boxes_s = boxes[order]
    keep = nms_rotated_fixed(
        corners[:, :4, :2], scores_s, scores_s > 0.0, nms_threshold
    )
    return {
        "corners": corners,
        "scores": jnp.where(keep, scores_s, 0.0),
        "boxes": boxes_s,
        "valid": keep,
    }


def fuse_and_nms(
    corners_list,
    scores_list,
    valid_list,
    nms_threshold: float = 0.15,
    max_det: int = 300,
):
    """Late-fusion merge: pool per-agent detections (already in ego frame),
    re-rank by score and run one global NMS (ref inference_utils.py:18-47).

    All inputs are lists of fixed-size padded arrays.
    """
    corners = jnp.concatenate(corners_list, axis=0)
    scores = jnp.concatenate(scores_list, axis=0)
    valid = jnp.concatenate(valid_list, axis=0)
    masked = jnp.where(valid, scores, 0.0)
    top_scores, idx = jax.lax.top_k(masked, max_det)
    top_corners = corners[idx]
    top_valid = top_scores > 0.0
    keep = nms_rotated_fixed(
        top_corners[:, :4, :2], top_scores, top_valid, nms_threshold
    )
    return {
        "corners": top_corners,
        "scores": jnp.where(keep, top_scores, 0.0),
        "valid": keep,
    }


def strip_padding(result: dict):
    """Host-side: convert a padded result dict to dense numpy arrays."""
    valid = np.asarray(result["valid"])
    out = {}
    for key, value in result.items():
        if key == "valid":
            continue
        out[key] = np.asarray(value)[valid]
    order = np.argsort(-out["scores"])
    return {k: v[order] for k, v in out.items()}
