"""CIA-SSD and FPV-RCNN losses.

Capability parity with reference loss/ciassd_loss.py (stage-1: focal cls
+ sin-residual smooth-L1 + dir bins + IoU-quality regression — identical
math to PointPillarLoss with the iou branch) and loss/fpvrcnn_loss.py
(stage-2: RoI quality classification against IoU-with-GT targets + box
residual regression on positive RoIs, fixed-shape here).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.registry import register_loss
from .point_pillar_loss import (
    PointPillarLoss,
    add_sin_difference,
    weighted_smooth_l1,
)


@register_loss("ciassd_loss")
class CiassdLoss(PointPillarLoss):
    """Stage-1 loss: the PointPillar loss family with the IoU branch
    (ref loss/ciassd_loss.py — same focal/smooth-L1/dir/iou terms)."""


@register_loss("fpvrcnn_loss")
class FpvrcnnLoss:
    """stage1 (per-agent CIA-SSD on the *_single outputs) + stage2
    (RoI refinement against ego-frame GT)."""

    def __init__(self, args: dict):
        self.stage1 = CiassdLoss(args["stage1"])
        s2 = args.get("stage2", {})
        self.cls_weight = s2.get("cls_weight", 1.0)
        self.reg_weight = s2.get("reg_weight", 1.0)
        self.fg_thresh = s2.get("fg_thresh", 0.55)
        self.bg_thresh = s2.get("bg_thresh", 0.25)

    def set_anchors(self, anchors):
        self.stage1.set_anchors(anchors)

    def _stage2(self, output_dict, target_dict):
        from ..utils.rotated_iou import box2d_to_corners, rotated_iou_matrix

        rois = output_dict["boxes_fused"]  # (B, R, 7) hwl ego frame
        roi_valid = output_dict["valid_fused"]
        rcnn_cls = output_dict["rcnn_cls"]  # (B, R)
        rcnn_reg = output_dict["rcnn_reg"]  # (B, R, 7)
        gt = target_dict["gt_boxes"]  # (B, G, 7) hwl
        gt_mask = target_dict["gt_mask"] > 0  # (B, G)

        def one(rois, rv, cls_l, reg_l, gt, gm):
            rc = box2d_to_corners(rois[:, [0, 1, 5, 4, 6]], xp=jnp)
            gc = box2d_to_corners(gt[:, [0, 1, 5, 4, 6]], xp=jnp)
            iou = rotated_iou_matrix(rc, gc, xp=jnp)  # (R, G)
            iou = jnp.where(gm[None, :], iou, -1.0)
            best = iou.max(axis=1)
            best_idx = iou.argmax(axis=1)
            matched = gt[best_idx]

            # quality target: scaled IoU in [0, 1] between bg/fg thresholds
            # (ref roi_head.assign_targets)
            q = jnp.clip(
                (best - self.bg_thresh) / (self.fg_thresh - self.bg_thresh),
                0.0,
                1.0,
            )
            care = rv
            bce = (
                jnp.clip(cls_l, 0, None)
                - cls_l * q
                + jnp.log1p(jnp.exp(-jnp.abs(cls_l)))
            )
            n_care = jnp.maximum(care.sum(), 1.0)
            cls_loss = (bce * care).sum() / n_care

            # residual targets in the roi frame for fg rois
            fg = care & (best > self.fg_thresh)
            diag = jnp.sqrt(rois[:, 4] ** 2 + rois[:, 5] ** 2)
            t_xyz = (matched[:, :3] - rois[:, :3]) / jnp.maximum(
                jnp.stack([diag, diag, rois[:, 3]], axis=-1), 1e-3
            )
            t_dim = jnp.log(
                jnp.maximum(matched[:, 3:6], 1e-3)
                / jnp.maximum(rois[:, 3:6], 1e-3)
            )
            t_yaw = matched[:, 6:7] - rois[:, 6:7]
            target = jnp.concatenate([t_xyz, t_dim, t_yaw], axis=-1)
            p, t = add_sin_difference(reg_l[None], target[None])
            reg = weighted_smooth_l1(
                p[0], t[0], fg[:, None].astype(jnp.float32), 3.0
            )
            n_fg = jnp.maximum(fg.sum(), 1.0)
            reg_loss = reg.sum() / n_fg
            return cls_loss, reg_loss

        cls_l, reg_l = jax.vmap(one)(
            rois, roi_valid, rcnn_cls, rcnn_reg, gt, gt_mask
        )
        return cls_l.mean() * self.cls_weight, reg_l.mean() * self.reg_weight

    def __call__(self, output_dict, target_dict, suffix: str = ""):
        # stage 1 on the per-agent single outputs when present
        s1_out = {
            k[: -len("_single")]: v
            for k, v in output_dict.items()
            if k.endswith("_single")
        }
        s1_tgt = target_dict
        if "pos_equal_one_single" in target_dict:
            s1_tgt = {
                "pos_equal_one": target_dict["pos_equal_one_single"],
                "neg_equal_one": target_dict["neg_equal_one_single"],
                "targets": target_dict["targets_single"],
            }
        total, aux = self.stage1(s1_out or output_dict, s1_tgt)
        aux = {f"stage1_{k}": v for k, v in aux.items()}
        if "rcnn_cls" in output_dict and "gt_boxes" in target_dict:
            cls2, reg2 = self._stage2(output_dict, target_dict)
            total = total + cls2 + reg2
            aux["rcnn_cls_loss"] = cls2
            aux["rcnn_reg_loss"] = reg2
        aux["total_loss"] = total
        return total, aux
