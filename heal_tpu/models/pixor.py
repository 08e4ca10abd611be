"""PIXOR detector: dense BEV rasterization + anchor-free dense heads.

Capability parity with reference models/pixor.py / pixor_intermediate.py
and the BevPreprocessor (data_utils/pre_processor/bev_preprocessor.py):
the point cloud is rasterized to a dense occupancy volume (one channel
per z slab + mean intensity), run through a ResNet BEV backbone, and
decoded anchor-free (per-pixel objectness + direct box regression —
shares the anchor_free decode path with CenterPoint).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .center_point import CenterHeads
from .point_pillar import _backbone_from_args, _shrink_from_args
from .registry import register_model


def bev_rasterize(
    points, mask, lidar_range: Sequence[float], res: float, z_slabs: int
):
    """points (B, N, 4) -> (B, ny, nx, z_slabs + 1) occupancy + intensity."""
    b, n, _ = points.shape
    x0, y0, z0, x1, y1, z1 = lidar_range
    nx = int(round((x1 - x0) / res))
    ny = int(round((y1 - y0) / res))
    dz = (z1 - z0) / z_slabs
    xi = jnp.floor((points[..., 0] - x0) / res).astype(jnp.int32)
    yi = jnp.floor((points[..., 1] - y0) / res).astype(jnp.int32)
    zi = jnp.floor((points[..., 2] - z0) / dz).astype(jnp.int32)
    ok = (
        mask
        & (xi >= 0) & (xi < nx)
        & (yi >= 0) & (yi < ny)
        & (zi >= 0) & (zi < z_slabs)
    )
    cells = ny * nx * z_slabs + 1
    ids = jnp.where(ok, (yi * nx + xi) * z_slabs + zi, ny * nx * z_slabs)
    flat = (ids + jnp.arange(b, dtype=ids.dtype)[:, None] * cells).reshape(-1)
    order = jnp.argsort(flat)
    flat = flat[order]
    okf = ok.reshape(-1)[order].astype(points.dtype)
    inten = points[..., 3].reshape(-1)[order] * okf
    occ = jax.ops.segment_max(
        okf, flat, num_segments=b * cells, indices_are_sorted=True
    )
    occ = jnp.maximum(jnp.where(jnp.isfinite(occ), occ, 0.0), 0.0)
    isum = jax.ops.segment_sum(
        jnp.stack([inten, okf], 1), flat, num_segments=b * cells,
        indices_are_sorted=True,
    )
    imean = isum[:, 0] / jnp.maximum(isum[:, 1], 1.0)
    occ = occ.reshape(b, cells)[:, :-1].reshape(b, ny, nx, z_slabs)
    # mean intensity over the column (all slabs)
    im = imean.reshape(b, cells)[:, :-1].reshape(b, ny, nx, z_slabs)
    im = im.mean(axis=-1, keepdims=True)
    return jnp.concatenate([occ, im], axis=-1)


@register_model("pixor")
class Pixor(nn.Module):
    """args: lidar_range, bev_res, z_slabs, base_bev_backbone, ..."""

    args: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        a = self.args
        norm = a.get("norm", "batch")
        bev = bev_rasterize(
            batch["points"],
            batch["point_mask"],
            a["lidar_range"],
            a.get("bev_res", a.get("voxel_size", [0.4])[0]),
            a.get("z_slabs", 10),
        )
        feat = _backbone_from_args(a, norm)(bev, train)
        shrink = _shrink_from_args(a, norm)
        if shrink is not None:
            feat = shrink(feat, train)
        out = _pixor_heads(feat) if a.get("pixor_head") else CenterHeads()(feat)
        out["spatial_features_2d"] = feat
        if not a.get("pixor_head"):
            out["anchor_free"] = True
        return out


def _pixor_heads(feat):
    """Faithful PIXOR heads (ref models/pixor.py:233-234,250-253): 3x3
    convs emitting a 1-channel objectness logit map + 6-channel
    (cos, sin, dx, dy, log w, log l) regression map, NHWC. Pairs with
    losses/pixor_loss.py and targets.generate_pixor_label_map."""
    return {
        "cls": nn.Conv(1, (3, 3), name="cls_head")(feat),
        "reg": nn.Conv(6, (3, 3), name="reg_head")(feat),
    }


@register_model("pixor_intermediate")
class PixorIntermediate(nn.Module):
    args: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        from .fuse import build_fusion

        a = self.args
        norm = a.get("norm", "batch")
        points = batch["points"]
        pmask = batch["point_mask"]
        b, l = points.shape[:2]
        bev = bev_rasterize(
            points.reshape((b * l,) + points.shape[2:]),
            pmask.reshape((b * l,) + pmask.shape[2:]),
            a["lidar_range"],
            a.get("bev_res", a.get("voxel_size", [0.4])[0]),
            a.get("z_slabs", 10),
        )
        feat = _backbone_from_args(a, norm)(bev, train)
        shrink = _shrink_from_args(a, norm)
        if shrink is not None:
            feat = shrink(feat, train)
        feat = feat.reshape((b, l) + feat.shape[1:])
        method = a.get("fusion_method", "max")
        fargs = dict(a.get(method, {}) or {})
        fargs.setdefault("in_channels", feat.shape[-1])
        fused = build_fusion(method, fargs)(
            feat, batch["pairwise_affine"], batch["agent_mask"], train
        )
        out = (
            _pixor_heads(fused) if a.get("pixor_head") else CenterHeads()(fused)
        )
        out["spatial_features_2d"] = fused
        if not a.get("pixor_head"):
            out["anchor_free"] = True
        return out
