"""Standalone SECOND detector + intermediate-fusion variant.

Capability parity with reference models/second.py and
second_intermediate.py: SECOND sparse-conv encoder -> BEV backbone ->
heads; the intermediate variant fuses per-agent BEV maps with a
fusion_in_one method before the heads.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax

from .heads import DetectionHeads
from .point_pillar import _backbone_from_args, _shrink_from_args
from .registry import register_model
from .second import SecondEncoder


def _encoder_from_args(a: dict, norm: str) -> SecondEncoder:
    return SecondEncoder(
        voxel_size=tuple(a["voxel_size"]),
        lidar_range=tuple(a["lidar_range"]),
        channels=tuple(a.get("second", {}).get("channels", (16, 32, 64, 64))),
        max_voxels=tuple(
            a.get("second", {}).get(
                "max_voxels", (24000, 16000, 12000, 8000)
            )
        ),
        norm=norm,
        presorted=a.get("presorted", False),
    )


@register_model("second")
class Second(nn.Module):
    """args: voxel_size, lidar_range, (second {channels, max_voxels}),
    base_bev_backbone, (shrink_header), anchor_number, (dir_args)."""

    args: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        a = self.args
        norm = a.get("norm", "batch")
        encoder = _encoder_from_args(a, norm)
        backbone = _backbone_from_args(a, norm)
        shrink = _shrink_from_args(a, norm)
        heads = DetectionHeads(
            anchor_number=a["anchor_number"],
            use_dir="dir_args" in a,
            num_bins=a.get("dir_args", {}).get("num_bins", 2),
            use_iou=a.get("use_iou", False),
        )
        bev = encoder(batch["points"], batch["point_mask"], train)
        feat = backbone(bev, train)
        if shrink is not None:
            feat = shrink(feat, train)
        out = heads(feat)
        out["spatial_features_2d"] = feat
        return out


@register_model("second_ssfa")
class SecondSSFA(nn.Module):
    """SECOND encoder + SSFA neck + anchor heads (ref
    models/second_ssfa.py: MeanVFE -> VoxelBackBone8x -> HeightCompression
    -> cia_ssd_utils.SSFA -> Head with IoU branch)."""

    args: Any
    use_uncertainty: bool = False

    @nn.compact
    def __call__(self, batch, train: bool = False):
        from .ciassd import SSFA
        from .layers import ConvNormAct

        a = self.args
        norm = a.get("norm", "batch")
        encoder = _encoder_from_args(a, norm)
        shrink = _shrink_from_args(a, norm)
        points = batch["points"]
        mask = batch["point_mask"]
        if points.ndim == 4:  # (B, L, N, 4) agent-batched
            b, l = points.shape[:2]
            points = points.reshape((b * l,) + points.shape[2:])
            mask = mask.reshape((b * l,) + mask.shape[2:])
        bev = encoder(points, mask, train)
        feat_num = a.get("ssfa", {}).get("feature_num", 128)
        bev = ConvNormAct(feat_num, 3, 1, norm=norm, name="input_proj")(
            bev, train
        )
        feat = SSFA(features=feat_num, norm=norm, name="ssfa")(bev, train)
        if shrink is not None:
            feat = shrink(feat, train)
        heads = DetectionHeads(
            anchor_number=a["anchor_number"],
            use_dir="dir_args" in a,
            num_bins=a.get("dir_args", {}).get("num_bins", 2),
            use_iou=a.get("use_iou", not self.use_uncertainty),
        )
        out = heads(feat)
        if self.use_uncertainty:
            # log-var x/y + log-kappa yaw per anchor
            # (ref second_ssfa_uncertainty.py unc_head)
            out["unc_preds"] = nn.Conv(
                a.get("uncertainty_dim", 3) * a["anchor_number"], (1, 1),
                name="unc_head",
            )(feat)
        out["spatial_features_2d"] = feat
        return out


@register_model("second_ssfa_uncertainty")
class SecondSSFAUncertainty(nn.Module):
    """SECOND + SSFA with an aleatoric-uncertainty head
    (ref models/second_ssfa_uncertainty.py)."""

    args: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        return SecondSSFA(
            args=self.args, use_uncertainty=True, name="ssfa_unc"
        )(batch, train)


@register_model("second_intermediate")
class SecondIntermediate(nn.Module):
    """Homogeneous SECOND intermediate fusion (swappable fusion method)."""

    args: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        from .fuse import build_fusion

        a = self.args
        norm = a.get("norm", "batch")
        encoder = _encoder_from_args(a, norm)
        backbone = _backbone_from_args(a, norm)
        shrink = _shrink_from_args(a, norm)
        method = a.get("fusion_method", "max")
        fusion_args = dict(a.get(method, {}) or {})
        fusion_args.setdefault("in_channels", a.get("in_head", 64))
        fusion = build_fusion(method, fusion_args)
        heads = DetectionHeads(
            anchor_number=a["anchor_number"],
            use_dir="dir_args" in a,
            num_bins=a.get("dir_args", {}).get("num_bins", 2),
            use_iou=a.get("use_iou", False),
        )

        points = batch["points"]  # (B, L, N, 4)
        pmask = batch["point_mask"]
        b, l = points.shape[:2]
        flat_p = points.reshape((b * l,) + points.shape[2:])
        flat_m = pmask.reshape((b * l,) + pmask.shape[2:])
        bev = encoder(flat_p, flat_m, train)
        feat = backbone(bev, train)
        if shrink is not None:
            feat = shrink(feat, train)
        feat = feat.reshape((b, l) + feat.shape[1:])
        fused = fusion(
            feat, batch["pairwise_affine"], batch["agent_mask"], train
        )
        out = heads(fused)
        out["spatial_features_2d"] = fused
        return out
