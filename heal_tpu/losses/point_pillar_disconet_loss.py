"""DiscoNet knowledge-distillation loss.

Capability of reference loss/point_pillar_disconet_loss.py: the student's
detection loss plus a feature-imitation term pulling the student's fused
BEV feature toward the (early-fusion, projected-lidar) teacher's feature.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models.registry import register_loss
from .point_pillar_loss import PointPillarLoss


@register_loss("point_pillar_disconet_loss")
class PointPillarDiscoNetLoss(PointPillarLoss):
    def __init__(self, args: dict):
        super().__init__(args)
        self.kd_weight = args.get("kd", {}).get("weight", 1.0)

    def __call__(self, output_dict, target_dict, suffix: str = ""):
        total, aux = super().__call__(output_dict, target_dict, suffix)
        if "teacher_feature" in output_dict and "spatial_features_2d" in output_dict:
            student = output_dict["spatial_features_2d"]
            teacher = output_dict["teacher_feature"]
            kd = jnp.mean((student - teacher) ** 2)
            kd = kd * self.kd_weight
            total = total + kd
            aux = dict(aux, kd_loss=kd, total_loss=total)
        return total, aux
