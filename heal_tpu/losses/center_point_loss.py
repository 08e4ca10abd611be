"""CenterPoint anchor-free loss: gaussian-focal heatmap + center L1.

Capability of reference loss/center_point_loss.py (700 LoC, compacted):
penalty-reduced focal loss on the center heatmap and smooth-L1 on direct
box parameters at GT centers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.registry import register_loss
from .point_pillar_loss import weighted_smooth_l1


def gaussian_focal_loss(pred_logits, heatmap, alpha=2.0, beta=4.0):
    """CornerNet penalty-reduced focal loss; heatmap in [0, 1]."""
    p = jax.nn.sigmoid(pred_logits)
    eps = 1e-6
    pos = (heatmap >= 1.0 - 1e-4).astype(p.dtype)
    neg = 1.0 - pos
    pos_loss = -jnp.log(p + eps) * (1 - p) ** alpha * pos
    neg_loss = (
        -jnp.log(1 - p + eps) * p**alpha * (1 - heatmap) ** beta * neg
    )
    num_pos = jnp.maximum(pos.sum(), 1.0)
    return (pos_loss.sum() + neg_loss.sum()) / num_pos


@register_loss("center_point_loss")
class CenterPointLoss:
    def __init__(self, args: dict):
        self.args = args
        self.cls_weight = args.get("cls", {}).get("weight", 1.0)
        self.reg_weight = args.get("reg", {}).get("weight", 2.0)
        self.sigma = args.get("reg", {}).get("sigma", 3.0)

    def __call__(self, output_dict, target_dict, suffix: str = ""):
        hm_logits = output_dict[f"cls_preds{suffix}"]  # (B, H, W, 1)
        box_preds = output_dict[f"reg_preds{suffix}"]  # (B, H, W, 7)
        heatmap = target_dict["heatmap"]
        box_t = target_dict["box_targets"]
        m = target_dict["reg_mask"][..., None]

        cls_loss = gaussian_focal_loss(hm_logits, heatmap) * self.cls_weight
        reg = weighted_smooth_l1(box_preds, box_t, m, self.sigma)
        reg_loss = (
            reg.sum() / jnp.maximum(m.sum(), 1.0) * self.reg_weight
        )
        total = cls_loss + reg_loss
        return total, {
            "cls_loss": cls_loss,
            "reg_loss": reg_loss,
            "total_loss": total,
        }
