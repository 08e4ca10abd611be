"""HEAL Pyramid-Fusion loss: detection loss + per-level occupancy focal loss.

Semantics of reference loss/point_pillar_pyramid_loss.py:
  * collab mode, no suffix: plain detection loss on the fused output;
  * collab mode, "_single" suffix: only the per-agent occupancy loss over
    the pyramid's per-level single-agent occ maps;
  * single mode: detection loss + occupancy loss (stage-2 training).
Occupancy labels: any-anchor-positive map, max-pool-downsampled per level
(:68-102). Depth supervision (LSS) is handled by the camera branch loss.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.registry import register_loss
from .point_pillar_loss import PointPillarLoss, sigmoid_focal_loss


def _max_pool2d(x, k: int):
    """(B, H, W, 1) max pool with kernel=stride=k."""
    if k == 1:
        return x
    return nn.max_pool(x, window_shape=(k, k), strides=(k, k))


@register_loss("point_pillar_pyramid_loss")
class PointPillarPyramidLoss(PointPillarLoss):
    def __init__(self, args: dict):
        super().__init__(args)
        self.relative_downsample = args["pyramid"]["relative_downsample"]
        self.pyramid_weight = args["pyramid"]["weight"]

    def occ_loss(self, occ_single_list, positives, negatives):
        """occ_single_list: per-level (B, H_l, W_l, 1) logits (NHWC).

        positives/negatives: (B, H, W, A) anchor maps at level-0 stride.
        """
        b = positives.shape[0]
        occ_pos = jnp.any(positives > 0, axis=-1, keepdims=True).astype(
            jnp.float32
        )
        occ_neg = jnp.all(negatives > 0, axis=-1, keepdims=True).astype(
            jnp.float32
        )
        total = 0.0
        for i, occ_preds in enumerate(occ_single_list):
            k = self.relative_downsample[i]
            pos_l = _max_pool2d(occ_pos, k).reshape(b, -1, 1)
            neg_l = (1.0 - _max_pool2d(1.0 - occ_neg, k)).reshape(b, -1, 1)
            pos_normalizer = jnp.maximum(pos_l.sum(1, keepdims=True), 1.0)
            w = (pos_l * self.pos_cls_weight + neg_l) / pos_normalizer
            loss = sigmoid_focal_loss(
                occ_preds.reshape(b, -1, 1),
                pos_l,
                w,
                alpha=self.cls["alpha"],
                gamma=self.cls["gamma"],
            )
            total = total + loss.sum() / b * self.pyramid_weight[i]
        return total

    def __call__(self, output_dict, target_dict, suffix: str = ""):
        mode = output_dict.get("pyramid", "collab")
        if mode == "collab":
            if suffix == "":
                return super().__call__(output_dict, target_dict)
            assert suffix == "_single"
            occ = self.occ_loss(
                output_dict["occ_single_list"],
                target_dict["pos_equal_one"],
                target_dict["neg_equal_one"],
            )
            return occ, {"pyramid_loss": occ, "total_loss": occ}
        # single (stage-2): detection + occupancy
        total, aux = super().__call__(output_dict, target_dict, suffix)
        occ = self.occ_loss(
            output_dict["occ_single_list"],
            target_dict["pos_equal_one"],
            target_dict["neg_equal_one"],
        )
        total = total + occ
        aux = dict(aux, pyramid_loss=occ, total_loss=total)
        return total, aux
