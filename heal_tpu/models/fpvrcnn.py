"""FPV-RCNN: two-stage collaborative detector.

Capability parity with reference models/fpvrcnn.py +
sub_modules/{vsa.py, matcher.py, roi_head.py} (+ the pointnet2 CUDA ops
they wrap): CIA-SSD first stage per agent -> keypoint features
(FPS + raw-point set abstraction + BEV bilinear interp, replacing
VoxelSetAbstraction) -> proposals projected to the ego frame and fused
by score-weighted clustering (Matcher Algorithm 1) -> RoI grid pooling
over the merged keypoints -> box refinement + quality score.

TPU-first: every stage is fixed-shape. Proposals are capped per agent
(``proposals_per_agent``) with validity masks; clustering is a greedy
leader assignment (score-ordered NMS leaders + weighted member
averaging), keypoints are capped per agent and merged along a static
L*K axis.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry
from ..ops.nms import nms_rotated_fixed
from ..ops.pointnet import ball_query, farthest_point_sample, group_and_pool
from ..postprocess.anchors import generate_anchor_box
from ..utils.rotated_iou import box2d_to_corners, rotated_iou_matrix
from .ciassd import SSFA
from .heads import DetectionHeads
from .layers import ConvNormAct
from .registry import register_model
from .second import SecondEncoder


def transform_boxes(boxes, tfm):
    """Rigid-transform (P, 7) hwl boxes by a (4, 4) matrix."""
    center = boxes[:, :3] @ tfm[:3, :3].T + tfm[:3, 3]
    dyaw = jnp.arctan2(tfm[1, 0], tfm[0, 0])
    return jnp.concatenate(
        [center, boxes[:, 3:6], boxes[:, 6:7] + dyaw], axis=-1
    )


class PointMLP(nn.Module):
    """Per-point shared MLP (dense over the channel axis)."""

    features: tuple

    @nn.compact
    def __call__(self, x):
        for f in self.features:
            x = nn.relu(nn.Dense(f)(x))
        return x


class KeypointEncoder(nn.Module):
    """VSA replacement: FPS keypoints + raw-point SA + BEV interp.

    points (N, 4) + mask -> (keypoints (K, 3), feats (K, C), kp_mask (K,)).
    """

    num_keypoints: int = 512
    sa_radius: float = 0.8
    sa_nsample: int = 16
    sa_features: tuple = (32, 32)
    bev_stride: float = 0.8  # meters per BEV cell of the ssfa map

    @nn.compact
    def __call__(self, points, mask, bev, lidar_range, train=False):
        xyz = points[:, :3]
        kp_idx = farthest_point_sample(xyz, mask, self.num_keypoints)
        kp = xyz[kp_idx]
        kp_mask = mask[kp_idx]

        # raw-point set abstraction
        idx, valid = ball_query(
            kp, xyz, mask, self.sa_radius, self.sa_nsample
        )
        mlp = PointMLP(self.sa_features, name="sa_mlp")
        sa = group_and_pool(
            kp, xyz, points[:, 3:4], idx, valid, mlp, train
        )  # (K, C_sa)

        # BEV bilinear interpolation at keypoint xy
        h, w, c = bev.shape
        x0, y0 = lidar_range[0], lidar_range[1]
        u = (kp[:, 0] - x0) / self.bev_stride - 0.5
        v = (kp[:, 1] - y0) / self.bev_stride - 0.5
        ui = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 2)
        vi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 2)
        fu = jnp.clip(u - ui, 0.0, 1.0)[:, None]
        fv = jnp.clip(v - vi, 0.0, 1.0)[:, None]
        f00 = bev[vi, ui]
        f01 = bev[vi, ui + 1]
        f10 = bev[vi + 1, ui]
        f11 = bev[vi + 1, ui + 1]
        interp = (
            f00 * (1 - fu) * (1 - fv)
            + f01 * fu * (1 - fv)
            + f10 * (1 - fu) * fv
            + f11 * fu * fv
        )
        feats = jnp.concatenate([sa, interp.astype(sa.dtype)], axis=-1)
        feats = nn.relu(nn.Dense(self.sa_features[-1] * 4, name="proj")(feats))
        return kp, feats * kp_mask[:, None], kp_mask


def fuse_proposals(boxes, scores, valid, iou_thresh: float = 0.1):
    """Matcher Algorithm 1, fixed-shape (ref sub_modules/matcher.py:25-160):
    score-ordered leaders (greedy NMS at ``iou_thresh``), members assigned
    to their best-overlapping leader, fused box = score-weighted mean with
    yaw direction aligned to the leader.

    boxes (M, 7) hwl in the EGO frame, scores (M,), valid (M,).
    Returns (fused (M, 7), fused_scores (M,), leaders (M,) bool).
    """
    m = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -1.0))
    b = boxes[order]
    s = scores[order]
    va = valid[order]
    corners = box2d_to_corners(b[:, [0, 1, 5, 4, 6]], xp=jnp)
    leaders = nms_rotated_fixed(corners, s, va, iou_thresh)

    iou = rotated_iou_matrix(corners, corners, xp=jnp)  # (M, M)
    iou_to_leader = jnp.where(leaders[None, :] & va[:, None], iou, -1.0)
    assign = jnp.argmax(iou_to_leader, axis=1)  # member -> leader idx
    attached = (jnp.take_along_axis(
        iou_to_leader, assign[:, None], axis=1
    )[:, 0] > iou_thresh) | leaders
    member_w = jnp.where(va & attached, s, 0.0)  # (M,)

    onehot = jax.nn.one_hot(assign, m, dtype=boxes.dtype) * member_w[:, None]
    wsum = onehot.sum(0)  # (M,) total weight per leader

    # align member yaw to the leader's direction (flip by pi when the
    # difference exceeds pi/2, as cluster_fusion's direction vote)
    lead_yaw = b[assign, 6]
    dyaw = b[:, 6] - lead_yaw
    dyaw = jnp.mod(dyaw + jnp.pi / 2, jnp.pi) - jnp.pi / 2
    aligned = jnp.concatenate(
        [b[:, :6], (lead_yaw + dyaw)[:, None]], axis=-1
    )
    fused = (onehot.T @ aligned) / jnp.maximum(wsum[:, None], 1e-6)
    fused = jnp.where(leaders[:, None], fused, b)
    return fused, jnp.where(leaders, s, 0.0), leaders & va


class RoIGridHead(nn.Module):
    """RoI grid pooling + refinement (ref sub_modules/roi_head.py):
    ``grid_size``^3 sample points per RoI gather nearby keypoint features
    (ball query), pooled, then FC layers regress a box residual and a
    quality score."""

    grid_size: int = 4
    radius: float = 1.6
    nsample: int = 8
    fc: tuple = (256, 256)

    @nn.compact
    def __call__(self, rois, kp_xyz, kp_feats, kp_mask, train=False):
        """rois (R, 7) hwl ego frame; kp_* (K, ...). -> (cls (R,), reg (R, 7))."""
        r = rois.shape[0]
        g = self.grid_size
        # dense grid points in the (rotated) roi frame
        lin = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g - 0.5
        gz, gy, gx = jnp.meshgrid(lin, lin, lin, indexing="ij")
        grid = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)  # (g^3, 3)
        dims = rois[:, [5, 4, 3]]  # l, w, h
        local = grid[None] * dims[:, None, :]
        c, s = jnp.cos(rois[:, 6]), jnp.sin(rois[:, 6])
        rx = local[..., 0] * c[:, None] - local[..., 1] * s[:, None]
        ry = local[..., 0] * s[:, None] + local[..., 1] * c[:, None]
        pts = jnp.stack(
            [rx + rois[:, None, 0], ry + rois[:, None, 1],
             local[..., 2] + rois[:, None, 2]],
            axis=-1,
        ).reshape(r * g**3, 3)

        idx, valid = ball_query(
            pts, kp_xyz, kp_mask, self.radius, self.nsample
        )
        mlp = PointMLP((64, 64), name="pool_mlp")
        pooled = group_and_pool(
            pts, kp_xyz, kp_feats, idx, valid, mlp, train
        )  # (R*g^3, 64)
        feat = pooled.reshape(r, -1)
        for i, f in enumerate(self.fc):
            feat = nn.relu(nn.Dense(f, name=f"fc_{i}")(feat))
        cls = nn.Dense(1, name="cls")(feat)[:, 0]
        reg = nn.Dense(7, name="reg")(feat)
        return cls, reg


@register_model("fpvrcnn")
class FPVRCNN(nn.Module):
    """args: voxel_size, lidar_range, second{...}, ssfa{feature_num},
    anchor_args (anchor grid for the stage-1 decode), anchor_number,
    dir_args, stage2 {proposals_per_agent, num_keypoints, grid_size},
    activate_stage2."""

    args: Any

    def setup(self):
        a = self.args
        norm = a.get("norm", "batch")
        self.encoder = SecondEncoder(
            voxel_size=tuple(a["voxel_size"]),
            lidar_range=tuple(a["lidar_range"]),
            channels=tuple(
                a.get("second", {}).get("channels", (16, 32, 64, 64))
            ),
            max_voxels=tuple(
                a.get("second", {}).get(
                    "max_voxels", (24000, 16000, 12000, 8000)
                )
            ),
            norm=norm,
        )
        feat_num = a.get("ssfa", {}).get("feature_num", 128)
        self.input_proj = ConvNormAct(
            feat_num, 3, 1, norm=norm, name="input_proj"
        )
        self.ssfa = SSFA(features=feat_num, norm=norm, name="ssfa")
        self.heads = DetectionHeads(
            anchor_number=a["anchor_number"],
            use_dir="dir_args" in a,
            num_bins=a.get("dir_args", {}).get("num_bins", 2),
            use_iou=True,
            name="heads",
        )
        s2 = a.get("stage2", {})
        self.num_proposals = s2.get("proposals_per_agent", 16)
        self.kp_encoder = KeypointEncoder(
            num_keypoints=s2.get("num_keypoints", 512),
            bev_stride=8 * a["voxel_size"][0],
            name="kp_encoder",
        )
        self.roi_head = RoIGridHead(
            grid_size=s2.get("grid_size", 4), name="roi_head"
        )
        self.anchors = jnp.asarray(
            generate_anchor_box(a["anchor_args"], a.get("order", "hwl"))
        )
        self.activate_stage2 = a.get("activate_stage2", True)
        self.score_threshold = s2.get("score_threshold", 0.15)

    def _stage1_decode(self, out1):
        """Per-agent top-P proposals from the stage-1 heads (no NMS yet —
        the matcher's clustering subsumes it)."""
        n_prop = self.num_proposals
        anchors = self.anchors.reshape(-1, 7)

        def one(cls_l, reg_l, iou_l):
            prob = jax.nn.sigmoid(cls_l.reshape(-1)).astype(jnp.float32)
            # CIA-SSD confidence rectification with the IoU branch
            iou = jnp.clip(
                (iou_l.reshape(-1).astype(jnp.float32) + 1.0) / 2.0, 0, 1
            )
            score = prob * iou
            top, idx = jax.lax.top_k(score, n_prop)
            boxes = geometry.decode_boxes(
                reg_l.reshape(-1, 7)[idx].astype(jnp.float32),
                anchors[idx],
            )
            return boxes, top, top > self.score_threshold

        return jax.vmap(one)(
            out1["cls_preds"], out1["reg_preds"], out1["iou_preds"]
        )

    def __call__(self, batch: dict, train: bool = False):
        a = self.args
        points = batch["points"]
        mask = batch["point_mask"]
        single_agent = points.ndim == 3
        if single_agent:
            points = points[:, None]
            mask = mask[:, None]
        b, l, n, _ = points.shape
        flat_p = points.reshape(b * l, n, -1)
        flat_m = mask.reshape(b * l, n)

        bev = self.encoder(flat_p, flat_m, train)
        bev = self.input_proj(bev, train)
        feat = self.ssfa(bev, train)
        out1 = self.heads(feat)

        out = {f"{k}_single": v for k, v in out1.items()}
        # stage-1 outputs double as the fused-head outputs for single-agent
        out.update(out1)
        out["spatial_features_2d"] = feat
        if not self.activate_stage2:
            return out

        # the matcher is non-differentiable in the reference
        # (matcher.py @torch.no_grad); stage-1 learns from its own loss,
        # stage-2 gradients flow through keypoint features only
        boxes, scores, valid = jax.lax.stop_gradient(
            self._stage1_decode(out1)
        )  # (B*L, P, ...)
        kp, kp_feat, kp_mask = jax.vmap(
            lambda p, m, f: self.kp_encoder(
                p, m, f, tuple(a["lidar_range"]), train
            )
        )(flat_p, flat_m, feat)

        # project proposals + keypoints into the ego frame:
        # pairwise[i, j] maps frame i -> frame j (transform_np
        # get_pairwise_transformation), so agent j -> ego is [:, j, 0]
        if "pairwise_t_matrix" in batch and not single_agent:
            t_to_ego = batch["pairwise_t_matrix"][:, :, 0].reshape(
                b * l, 4, 4
            )
        else:
            t_to_ego = jnp.tile(jnp.eye(4), (b * l, 1, 1))
        boxes = jax.vmap(transform_boxes)(boxes, t_to_ego)
        kp = jax.vmap(
            lambda p, t: p @ t[:3, :3].T + t[:3, 3]
        )(kp, t_to_ego)

        agent_mask = (
            batch["agent_mask"].reshape(b * l)
            if "agent_mask" in batch and not single_agent
            else jnp.ones(b * l, bool)
        )
        boxes = boxes.reshape(b, l * self.num_proposals, 7)
        scores = scores.reshape(b, -1) * agent_mask.reshape(b, l).repeat(
            self.num_proposals, axis=-1
        )
        valid = valid.reshape(b, -1) & (scores > 0)

        fused, fused_scores, fused_valid = jax.vmap(fuse_proposals)(
            boxes, scores, valid
        )
        k = kp.shape[1]
        kp = kp.reshape(b, l * k, 3)
        kp_feat = kp_feat.reshape(b, l * k, -1)
        kp_mask = (
            kp_mask.reshape(b, l, k)
            & agent_mask.reshape(b, l)[:, :, None]
        ).reshape(b, l * k)

        rcnn_cls, rcnn_reg = jax.vmap(
            lambda r, kx, kf, km: self.roi_head(r, kx, kf, km, train)
        )(fused, kp, kp_feat, kp_mask)

        out.update(
            {
                "boxes_fused": fused,
                "scores_fused": fused_scores,
                "valid_fused": fused_valid,
                "rcnn_cls": rcnn_cls,
                "rcnn_reg": rcnn_reg,
            }
        )
        return out
