"""CenterPoint: anchor-free BEV detector (+ intermediate variant).

Capability parity with reference models/center_point.py /
center_point_baseline{_multiscale}.py / center_point_intermediate.py:
pillar encoder -> BEV backbone -> heatmap head (1 channel) + direct box
regression head (7 channels); fusion variant fuses BEV features before
the heads.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn

from .encoders import PointPillarEncoder
from .point_pillar import _backbone_from_args, _shrink_from_args
from .registry import register_model


class CenterHeads(nn.Module):
    @nn.compact
    def __call__(self, x):
        return {
            "cls_preds": nn.Conv(
                1,
                (1, 1),
                name="heatmap_head",
                bias_init=nn.initializers.constant(-2.19),  # focal prior
            )(x),
            "reg_preds": nn.Conv(7, (1, 1), name="box_head")(x),
        }


def _encoder(a, norm):
    return PointPillarEncoder(
        voxel_size=tuple(a["voxel_size"]),
        lidar_range=tuple(a["lidar_range"]),
        num_filters=tuple(a["pillar_vfe"]["num_filters"]),
        norm=norm,
    )


@register_model("center_point")
class CenterPoint(nn.Module):
    args: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        a = self.args
        norm = a.get("norm", "batch")
        bev = _encoder(a, norm)(batch["points"], batch["point_mask"], train)
        feat = _backbone_from_args(a, norm)(bev, train)
        shrink = _shrink_from_args(a, norm)
        if shrink is not None:
            feat = shrink(feat, train)
        out = CenterHeads()(feat)
        out["spatial_features_2d"] = feat
        out["anchor_free"] = True
        return out


@register_model("center_point_baseline")
class CenterPointBaseline(nn.Module):
    """Intermediate fusion variant with swappable fusion net."""

    args: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        from .fuse import build_fusion

        a = self.args
        norm = a.get("norm", "batch")
        points = batch["points"]
        pmask = batch["point_mask"]
        b, l = points.shape[:2]
        flat_p = points.reshape((b * l,) + points.shape[2:])
        flat_m = pmask.reshape((b * l,) + pmask.shape[2:])
        bev = _encoder(a, norm)(flat_p, flat_m, train)
        backbone = _backbone_from_args(a, norm)
        feat = backbone(bev, train)
        shrink = _shrink_from_args(a, norm)
        if shrink is not None:
            feat = shrink(feat, train)
        feat = feat.reshape((b, l) + feat.shape[1:])
        method = a.get("fusion_method", "max")
        fargs = dict(a.get(method, {}) or {})
        fargs.setdefault("in_channels", feat.shape[-1])
        heads = CenterHeads()
        extra = {}
        if method == "where2comm":
            # heatmap confidence gates transmissions
            # (ref models/center_point_where2comm.py)
            import jax

            single = heads(feat.reshape((b * l,) + feat.shape[2:]))
            conf = jax.nn.sigmoid(single["cls_preds"])
            if a.get("supervise_single", False):
                extra = {f"{k}_single": v for k, v in single.items()}
            if fargs.get("multi_scale"):
                fused, comm_rate = self._multiscale_where2comm(
                    backbone, bev, conf, fargs, batch, b, l, train
                )
                if shrink is not None:
                    fused = shrink(fused, train)
            else:
                fused, comm_rate = build_fusion(method, fargs)(
                    feat,
                    batch["pairwise_affine"],
                    batch["agent_mask"],
                    train,
                    confidence=conf.reshape((b, l) + conf.shape[1:]),
                )
            extra["comm_rate"] = comm_rate
        else:
            fused = build_fusion(method, fargs)(
                feat, batch["pairwise_affine"], batch["agent_mask"], train
            )
        out = heads(fused)
        out["spatial_features_2d"] = fused
        out["anchor_free"] = True
        out.update(extra)
        return out


    def _multiscale_where2comm(
        self, backbone, bev, conf, fargs, batch, b, l, train
    ):
        """Per-backbone-level fusion with one level-0 communication mask
        max-pooled into deeper levels (ref where2comm_attn.py:254-310:
        mask at i==0 from the confidence maps, F.max_pool2d(mask, 2) for
        i>0, per-level fuse_modules, then deblock-decode)."""
        import jax

        from .fuse.fusion_in_one import Where2commFusion
        from .fuse.where2comm_comm import CommMask

        agg = fargs.get("agg_operator") or {}
        feats = backbone.encode(bev, train)
        h0, w0 = feats[0].shape[1:3]
        conf0 = jax.image.resize(
            conf.reshape((b, l) + conf.shape[1:]),
            (b, l, h0, w0, 1),
            "nearest",
        )
        mask, comm_rate = CommMask(
            threshold=fargs.get("threshold", 0.01),
            gaussian_smooth=fargs.get("gaussian_smooth", True),
            smooth_sigma=fargs.get("smooth_sigma", 1.0),
        )(conf0, train)
        fused_levels = []
        cur = mask  # (B, L, h, w, 1)
        for i, f in enumerate(feats):
            hi, wi = f.shape[1:3]
            if (hi, wi) != cur.shape[2:4]:
                ky = cur.shape[2] // hi
                kx = cur.shape[3] // wi
                flat = cur.reshape((b * l,) + cur.shape[2:])
                flat = nn.max_pool(flat, (ky, kx), strides=(ky, kx))
                cur = flat.reshape((b, l) + flat.shape[1:])
            fl = f.reshape((b, l) + f.shape[1:])
            fuse = Where2commFusion(
                fl.shape[-1],
                num_heads=agg.get("n_head", 8),
                agg_mode=str(agg.get("mode", "transformer")).lower(),
                with_spe=agg.get("with_spe", False),
                name=f"w2c_fuse_{i}",
            )
            fused_levels.append(
                fuse(
                    fl,
                    batch["pairwise_affine"],
                    batch["agent_mask"],
                    train,
                    comm_mask=cur,
                )
            )
        return backbone.decode(fused_levels, train), comm_rate


@register_model("center_point_where2comm")
class CenterPointWhere2comm(nn.Module):
    """CenterPoint + Where2comm comm-masked fusion
    (ref models/center_point_where2comm.py)."""

    args: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        return CenterPointBaseline(
            args={**self.args, "fusion_method": "where2comm"}
        )(batch, train)


@register_model("center_point_baseline_multiscale")
class CenterPointBaselineMultiscale(nn.Module):
    """Per-backbone-level fusion variant
    (ref models/center_point_baseline_multiscale.py): fuse each resnet
    stage's features independently, then deblock-decode."""

    args: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        from .fuse import build_fusion
        from .point_pillar import _backbone_from_args

        a = self.args
        norm = a.get("norm", "batch")
        points = batch["points"]
        pmask = batch["point_mask"]
        b, l = points.shape[:2]
        flat_p = points.reshape((b * l,) + points.shape[2:])
        flat_m = pmask.reshape((b * l,) + pmask.shape[2:])
        bev = _encoder(a, norm)(flat_p, flat_m, train)
        backbone = _backbone_from_args(a, norm)
        method = a.get("fusion_method", "max")
        feats = backbone.encode(bev, train)
        fused_levels = []
        for i, f in enumerate(feats):
            fargs = dict(a.get(method, {}) or {})
            fargs.setdefault("in_channels", f.shape[-1])
            fl = f.reshape((b, l) + f.shape[1:])
            fused_levels.append(
                build_fusion(method, fargs)(
                    fl, batch["pairwise_affine"], batch["agent_mask"], train
                )
            )
        fused = backbone.decode(fused_levels, train)
        shrink = _shrink_from_args(a, norm)
        if shrink is not None:
            fused = shrink(fused, train)
        out = CenterHeads()(fused)
        out["spatial_features_2d"] = fused
        out["anchor_free"] = True
        return out


@register_model("center_point_intermediate")
class CenterPointIntermediate(nn.Module):
    """CenterPoint with attention fusion folded into the backbone at
    every level (ref models/center_point_intermediate.py, which swaps
    BaseBEVBackbone for AttBEVBackbone: per-level self-attention across
    agents) — equivalent to the multiscale baseline pinned to 'att'."""

    args: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        return CenterPointBaselineMultiscale(
            args={**self.args, "fusion_method": "att"}, name="ms_att"
        )(batch, train)
