"""PointPillars detection loss.

Semantics of reference loss/point_pillar_loss.py: sigmoid focal cls loss
with pos_cls_weight and per-sample positive normalization; smooth-L1 reg
loss with sin-difference angle encoding; softmax direction-bin loss.
All reductions are mask-based over fixed shapes (no boolean indexing).

Prediction layout NHWC: cls (B, H, W, A), reg (B, H, W, A*7),
dir (B, H, W, A*bins); targets from heal_tpu.postprocess.targets.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.registry import register_loss
from ..utils.common import limit_period


def sigmoid_focal_loss(logits, labels, weights, alpha: float, gamma: float):
    """Per-element focal loss, weighted (ref point_pillar_loss.py:207-230)."""
    pred_sigmoid = jax.nn.sigmoid(logits)
    alpha_weight = labels * alpha + (1 - labels) * (1 - alpha)
    pt = labels * (1.0 - pred_sigmoid) + (1.0 - labels) * pred_sigmoid
    focal_weight = alpha_weight * jnp.power(pt, gamma)
    bce = (
        jnp.clip(logits, 0, None)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return bce * focal_weight * weights


def weighted_smooth_l1(preds, targets, weights, sigma: float):
    """Huber with transition at 1/sigma^2 (ref WeightedSmoothL1Loss)."""
    diff = preds - targets
    abs_diff = jnp.abs(diff)
    cut = 1.0 / (sigma**2)
    loss = jnp.where(
        abs_diff < cut,
        0.5 * (sigma * diff) ** 2,
        abs_diff - 0.5 * cut,
    )
    return loss * weights


def add_sin_difference(preds, targets, dim: int = 6):
    """Replace yaw residuals with sin(p-t) factorization (ref :125-137)."""
    rad_pred = jnp.sin(preds[..., dim : dim + 1]) * jnp.cos(
        targets[..., dim : dim + 1]
    )
    rad_tgt = jnp.cos(preds[..., dim : dim + 1]) * jnp.sin(
        targets[..., dim : dim + 1]
    )
    preds = jnp.concatenate(
        [preds[..., :dim], rad_pred, preds[..., dim + 1 :]], axis=-1
    )
    targets = jnp.concatenate(
        [targets[..., :dim], rad_tgt, targets[..., dim + 1 :]], axis=-1
    )
    return preds, targets


def direction_targets(
    reg_targets, anchor_yaw_deg, dir_offset: float, num_bins: int
):
    """One-hot direction bins from yaw residual + anchor yaw (ref :146-172).

    reg_targets: (B, N, 7) where N = H*W*A and anchors cycle fastest.
    """
    anchor_yaw = jnp.asarray(np.radians(np.asarray(anchor_yaw_deg)))
    a = anchor_yaw.shape[0]
    n = reg_targets.shape[1]
    anchor_map = jnp.tile(anchor_yaw, n // a)
    rot_gt = reg_targets[..., -1] + anchor_map[None, :]
    offset_rot = limit_period(rot_gt - dir_offset, 0.0, 2 * np.pi)
    bins = jnp.clip(
        jnp.floor(offset_rot / (2 * np.pi / num_bins)).astype(jnp.int32),
        0,
        num_bins - 1,
    )
    return jax.nn.one_hot(bins, num_bins)


def depth_focal_loss(logits, gt_bins, alpha: float = 0.25, gamma: float = 2.0):
    """Categorical focal loss over depth bins (LSS depth supervision,
    ref loss/point_pillar_depth_loss.py). gt == num_bins means "no lidar
    return" and is ignored.

    logits: (N, fH, fW, D); gt_bins: (N, fH, fW) int.
    """
    d = logits.shape[-1]
    valid = (gt_bins < d).astype(logits.dtype)
    onehot = jax.nn.one_hot(jnp.clip(gt_bins, 0, d - 1), d)
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    focal = alpha * (1.0 - p) ** gamma * (-logp)
    loss = (onehot * focal).sum(-1) * valid
    return loss.sum() / jnp.maximum(valid.sum(), 1.0)


@register_loss("point_pillar_loss")
class PointPillarLoss:
    def __init__(self, args: dict):
        self.args = args
        self.pos_cls_weight = args["pos_cls_weight"]
        self.cls = args["cls"]
        self.reg = args["reg"]
        self.dir = args.get("dir")
        # IoU-quality branch (CoAlign/uncertainty configs, ref
        # loss/point_pillar_loss.py:27-30,97-114): the iou head regresses
        # 2*IoU(decoded pred, decoded target)-1 at positive anchors
        self.iou = args.get("iou")
        self.iou_cap = (self.iou or {}).get("max_positive_anchors", 512)
        self.anchors = None  # set_anchors() before training with iou

    def set_anchors(self, anchors):
        """Anchor grid for the IoU branch's box decode (the trainer calls
        this with the dataset's anchors; ref reads output_dict['anchor_box'])."""
        self.anchors = jnp.asarray(anchors)

    def _iou_loss(self, output_dict, target_dict, suffix, reg_weights, b):
        """Static-shape IoU branch: top-K positive anchors per sample
        (the reference boolean-indexes positives; K caps them)."""
        from ..ops.geometry import decode_boxes
        from ..utils.rotated_iou import aligned_boxes_iou3d

        anchors = self.anchors.reshape(-1, 7)
        iou_preds = output_dict[f"iou_preds{suffix}"].reshape(b, -1)
        reg_preds = output_dict[f"reg_preds{suffix}"].reshape(b, -1, 7)
        reg_targets = target_dict["targets"].reshape(b, -1, 7)

        w = reg_weights.squeeze(-1)  # (B, N), > 0 at positives
        k = min(self.iou_cap, w.shape[1])
        top_w, idx = jax.lax.top_k(w, k)  # (B, K)
        take = jax.vmap(lambda arr, i: arr[i])
        boxes_pred = decode_boxes(
            jax.lax.stop_gradient(take(reg_preds, idx)), anchors[idx]
        )
        boxes_tgt = decode_boxes(take(reg_targets, idx), anchors[idx])
        iou = jax.lax.stop_gradient(
            aligned_boxes_iou3d(
                boxes_pred.astype(jnp.float32),
                boxes_tgt.astype(jnp.float32),
                xp=jnp,
            )
        )
        loss = weighted_smooth_l1(
            take(iou_preds, idx),
            2.0 * iou - 1.0,
            top_w,
            self.iou["sigma"],
        )
        return loss.sum() * self.iou["weight"] / b

    def __call__(self, output_dict, target_dict, suffix: str = ""):
        cls_preds = output_dict[f"cls_preds{suffix}"]
        b = cls_preds.shape[0]
        cls_labels = target_dict["pos_equal_one"].reshape(b, -1, 1)
        positives = cls_labels > 0
        negatives = target_dict["neg_equal_one"].reshape(b, -1, 1) > 0
        pos_normalizer = jnp.maximum(
            positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0
        )

        cls_preds = cls_preds.reshape(b, -1, 1)
        cls_weights = (
            positives * self.pos_cls_weight + negatives * 1.0
        ) / pos_normalizer
        cls_loss = sigmoid_focal_loss(
            cls_preds,
            cls_labels.astype(cls_preds.dtype),
            cls_weights,
            alpha=self.cls["alpha"],
            gamma=self.cls["gamma"],
        )
        cls_loss = cls_loss.sum() * self.cls["weight"] / b

        reg_weights = positives.astype(jnp.float32) / pos_normalizer
        reg_preds = output_dict[f"reg_preds{suffix}"].reshape(b, -1, 7)
        reg_targets = target_dict["targets"].reshape(b, -1, 7)
        reg_preds_sin, reg_targets_sin = add_sin_difference(
            reg_preds, reg_targets
        )
        reg_loss = weighted_smooth_l1(
            reg_preds_sin, reg_targets_sin, reg_weights, self.reg["sigma"]
        )
        reg_loss = reg_loss.sum() * self.reg["weight"] / b

        total = cls_loss + reg_loss
        aux = {"cls_loss": cls_loss, "reg_loss": reg_loss}

        if self.dir is not None and f"dir_preds{suffix}" in output_dict:
            num_bins = self.dir["args"]["num_bins"]
            dir_tgt = direction_targets(
                reg_targets,
                self.dir["args"]["anchor_yaw"],
                self.dir["args"]["dir_offset"],
                num_bins,
            )
            dir_logits = output_dict[f"dir_preds{suffix}"].reshape(
                b, -1, num_bins
            )
            log_probs = jax.nn.log_softmax(dir_logits, axis=-1)
            ce = -(dir_tgt * log_probs).sum(-1)
            dir_loss = (ce * reg_weights.squeeze(-1)).sum() * self.dir[
                "weight"
            ] / b
            total = total + dir_loss
            aux["dir_loss"] = dir_loss

        if (
            self.iou is not None
            and f"iou_preds{suffix}" in output_dict
            and self.anchors is not None
        ):
            iou_loss = self._iou_loss(
                output_dict, target_dict, suffix, reg_weights, b
            )
            total = total + iou_loss
            aux["iou_loss"] = iou_loss

        # LSS depth supervision on any camera modality present
        if "depth" in self.args:
            dsum = 0.0
            found = False
            for key, logits in output_dict.items():
                if not key.startswith("depth_items_"):
                    continue
                m = key.rsplit("_", 1)[-1]
                tkey = f"depth_bins_{m}"
                if tkey not in target_dict:
                    continue
                gt = target_dict[tkey]
                gt = gt.reshape((-1,) + gt.shape[-2:])
                dsum = dsum + depth_focal_loss(logits, gt)
                found = True
            if found:
                dloss = dsum * self.args["depth"]["weight"]
                total = total + dloss
                aux["depth_loss"] = dloss

        aux["total_loss"] = total
        return total, aux
