"""Single-agent PointPillars detector (+ homogeneous intermediate variant).

Reference: models/point_pillar.py (single), models/point_pillar_baseline.py
(intermediate with swappable fusion). Consumes padded raw points — the
voxelizer lives inside the encoder (see models/encoders.py).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .encoders import PointPillarEncoder
from .heads import DetectionHeads
from .layers import DownsampleConv
from .registry import register_model
from .resnet_bev import ResNetBEVBackbone


def _backbone_from_args(args: dict, norm: str) -> ResNetBEVBackbone:
    bb = args["base_bev_backbone"]
    return ResNetBEVBackbone(
        layer_nums=tuple(bb["layer_nums"]),
        layer_strides=tuple(bb["layer_strides"]),
        num_filters=tuple(bb["num_filters"]),
        upsample_strides=tuple(bb.get("upsample_strides", ())),
        num_upsample_filter=tuple(bb.get("num_upsample_filter", ())),
        resnext=bb.get("resnext", False),
        norm=norm,
    )


def _shrink_from_args(args: dict, norm: str):
    if "shrink_header" not in args:
        return None
    sh = args["shrink_header"]
    return DownsampleConv(
        dims=tuple(sh["dim"]),
        kernels=tuple(sh["kernal_size"]),
        strides=tuple(sh["stride"]),
        paddings=tuple(sh.get("padding", ())),
    )


@register_model("point_pillar")
class PointPillar(nn.Module):
    """args: voxel_size, lidar_range, pillar_vfe, point_pillar_scatter,
    base_bev_backbone, (shrink_header), anchor_number, (dir_args)."""

    args: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        a = self.args
        norm = a.get("norm", "batch")
        encoder = PointPillarEncoder(
            voxel_size=tuple(a["voxel_size"]),
            lidar_range=tuple(a["lidar_range"]),
            num_filters=tuple(a["pillar_vfe"]["num_filters"]),
            use_absolute_xyz=a["pillar_vfe"].get("use_absolute_xyz", True),
            with_distance=a["pillar_vfe"].get("with_distance", False),
            norm=norm,
            presorted=a.get("presorted", False),
        )
        backbone = _backbone_from_args(a, norm)
        shrink = _shrink_from_args(a, norm)
        heads = DetectionHeads(
            anchor_number=a["anchor_number"],
            use_dir="dir_args" in a,
            num_bins=a.get("dir_args", {}).get("num_bins", 2),
            use_iou=a.get("use_iou", False),
        )

        points = batch["points"]  # (B, N, 4)
        mask = batch["point_mask"]  # (B, N)
        bev = encoder(points, mask, train)
        feat = backbone(bev, train)
        if shrink is not None:
            feat = shrink(feat, train)
        out = heads(feat)
        out["spatial_features_2d"] = feat
        return out


@register_model("point_pillar_uncertainty")
class PointPillarUncertainty(nn.Module):
    """Single-agent PointPillars + aleatoric uncertainty head
    (ref models/point_pillar_uncertainty.py: extra 'sm' conv predicting
    log-var x/y + log-kappa yaw per anchor)."""

    args: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        a = self.args
        norm = a.get("norm", "batch")
        encoder = PointPillarEncoder(
            voxel_size=tuple(a["voxel_size"]),
            lidar_range=tuple(a["lidar_range"]),
            num_filters=tuple(a["pillar_vfe"]["num_filters"]),
            norm=norm,
        )
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
        out["unc_preds"] = nn.Conv(
            3 * a["anchor_number"], (1, 1), name="unc_head"
        )(feat)
        out["spatial_features_2d"] = feat
        return out


@register_model("point_pillar_baseline_multiscale")
class PointPillarBaselineMultiscale(nn.Module):
    """Homogeneous intermediate fusion at every backbone level
    (ref models/point_pillar_baseline_multiscale.py: per-level fusion
    nets over get_multiscale_feature outputs, then deblock-decode).

    Levels are computed on UNFUSED per-agent features; each level's
    fusion sees all agents warped to ego, and the decoded concat of
    fused levels feeds shrink + heads — matching the reference's
    fuse-then-decode order.
    """

    args: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        from .fuse import build_fusion
        from .layers import NaiveCompressor

        a = self.args
        norm = a.get("norm", "batch")
        encoder = PointPillarEncoder(
            voxel_size=tuple(a["voxel_size"]),
            lidar_range=tuple(a["lidar_range"]),
            num_filters=tuple(a["pillar_vfe"]["num_filters"]),
            use_absolute_xyz=a["pillar_vfe"].get("use_absolute_xyz", True),
            with_distance=a["pillar_vfe"].get("with_distance", False),
            norm=norm,
            presorted=a.get("presorted", False),
        )
        backbone = _backbone_from_args(a, norm)
        shrink = _shrink_from_args(a, norm)
        method = a["fusion_method"]
        num_filters = tuple(a["base_bev_backbone"]["num_filters"])
        fusions = [
            build_fusion(
                method,
                dict(
                    a.get(method, {}) or {}, in_channels=num_filters[i]
                ),
            )
            for i in range(len(num_filters))
        ]
        heads = DetectionHeads(
            anchor_number=a["anchor_number"],
            use_dir="dir_args" in a,
            num_bins=a.get("dir_args", {}).get("num_bins", 2),
            use_iou=a.get("use_iou", False),
        )

        points = batch["points"]  # (B, L, N, 4)
        pmask = batch["point_mask"]
        b, l = points.shape[:2]
        flat_pts = points.reshape((b * l,) + points.shape[2:])
        flat_msk = pmask.reshape((b * l,) + pmask.shape[2:])
        x = encoder(flat_pts, flat_msk, train)
        if "compression" in a:
            x = NaiveCompressor(
                input_dim=x.shape[-1],
                compress_ratio=a["compression"],
                norm=norm,
            )(x, train)
        fused_levels = []
        for i, fusion in enumerate(fusions):
            x = backbone.stages[i](x, train)
            xl = x.reshape((b, l) + x.shape[1:])
            fused_levels.append(
                fusion(xl, batch["pairwise_affine"], batch["agent_mask"],
                       train)
            )
        fused = backbone.decode(fused_levels, train)
        if shrink is not None:
            fused = shrink(fused, train)
        out = heads(fused)
        out["spatial_features_2d"] = fused
        return out


@register_model("point_pillar_disconet")
class PointPillarDiscoNet(nn.Module):
    """DiscoNet student: intermediate fusion fixed to DiscoFusion, with
    the fused feature exported for KD feature imitation against the
    early-fusion teacher (ref models/point_pillar_disconet.py; the
    teacher forward is grafted in by tools/train_w_kd.KDModel)."""

    args: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        out = PointPillarBaseline(
            args={**self.args, "fusion_method": "disconet"},
            name="student",
        )(batch, train)
        out["feature"] = out["spatial_features_2d"]
        return out


@register_model("point_pillar_disconet_teacher")
class PointPillarDiscoNetTeacher(nn.Module):
    """DiscoNet teacher: single-agent PointPillars run on the
    early-fused (ego-projected, merged) point cloud; exports
    ``teacher_feature`` for the KD loss
    (ref models/point_pillar_disconet_teacher.py)."""

    args: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        out = PointPillar(args=self.args, name="teacher")(batch, train)
        out["teacher_feature"] = out["spatial_features_2d"]
        return out


@register_model("point_pillar_baseline")
class PointPillarBaseline(nn.Module):
    """Homogeneous intermediate fusion with a swappable fusion net
    (reference models/point_pillar_baseline.py: encoder -> backbone ->
    shrink -> compress -> fusion -> heads).

    Batch: points (B, L, N, 4), point_mask (B, L, N), agent_mask (B, L),
    pairwise_affine (B, L, L, 2, 3).
    """

    args: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        from .fuse import build_fusion
        from .layers import NaiveCompressor

        a = self.args
        norm = a.get("norm", "batch")
        encoder = PointPillarEncoder(
            voxel_size=tuple(a["voxel_size"]),
            lidar_range=tuple(a["lidar_range"]),
            num_filters=tuple(a["pillar_vfe"]["num_filters"]),
            use_absolute_xyz=a["pillar_vfe"].get("use_absolute_xyz", True),
            with_distance=a["pillar_vfe"].get("with_distance", False),
            norm=norm,
            presorted=a.get("presorted", False),
        )
        backbone = _backbone_from_args(a, norm)
        shrink = _shrink_from_args(a, norm)
        method = a["fusion_method"]
        fusion_args = dict(a.get(method, {}) or {})
        fusion_args.setdefault(
            "in_channels", fusion_args.get("feat_dim", 64)
        )
        fusion = build_fusion(method, fusion_args)
        heads = DetectionHeads(
            anchor_number=a["anchor_number"],
            use_dir="dir_args" in a,
            num_bins=a.get("dir_args", {}).get("num_bins", 2),
            use_iou=a.get("use_iou", False),
        )

        points = batch["points"]
        pmask = batch["point_mask"]
        b, l = points.shape[:2]
        flat_pts = points.reshape((b * l,) + points.shape[2:])
        flat_msk = pmask.reshape((b * l,) + pmask.shape[2:])
        bev = encoder(flat_pts, flat_msk, train)
        feat = backbone(bev, train)
        if shrink is not None:
            feat = shrink(feat, train)
        if "compression" in a:
            feat = NaiveCompressor(
                input_dim=feat.shape[-1],
                compress_ratio=a["compression"],
                norm=norm,
            )(feat, train)
        feat = feat.reshape((b, l) + feat.shape[1:])
        extra = {}
        if method == "where2comm":
            # per-agent confidence from the shared heads = the reference's
            # psm (point_pillar_where2comm); gates transmissions + reports
            # comm_rate
            single = heads(feat.reshape((b * l,) + feat.shape[2:]))
            conf = jax.nn.sigmoid(single["cls_preds"]).max(
                axis=-1, keepdims=True
            )
            if a.get("supervise_single", False):
                extra = {f"{k}_single": v for k, v in single.items()}
            fused, comm_rate = fusion(
                feat,
                batch["pairwise_affine"],
                batch["agent_mask"],
                train,
                confidence=conf.reshape((b, l) + conf.shape[1:]),
            )
            extra["comm_rate"] = comm_rate
        else:
            fused = fusion(
                feat, batch["pairwise_affine"], batch["agent_mask"], train
            )
        out = heads(fused)
        out["spatial_features_2d"] = fused
        out.update(extra)
        return out
