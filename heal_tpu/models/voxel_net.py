"""VoxelNet detector (+ intermediate variant).

Capability parity with reference models/voxel_net.py (VFE -> dense 3D
conv middle layers -> RPN) — built on the same sorted-segment voxel
machinery as the other encoders: per-voxel mean/max features scattered
into a dense (nz, ny, nx, C) grid, 3D convs via NDHWC nn.Conv, z folded
into channels for the BEV backbone.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .encoders import PFNLayer
from .heads import DetectionHeads
from .layers import Norm
from .point_pillar import _backbone_from_args, _shrink_from_args
from .registry import register_model


class VoxelNetEncoder(nn.Module):
    """points (B, N, 4) -> dense BEV (B, ny, nx, nz' * C)."""

    voxel_size: Sequence[float]
    lidar_range: Sequence[float]
    vfe_features: int = 32
    conv3d_features: int = 64
    norm: str = "batch"

    @nn.compact
    def __call__(self, points, mask, train: bool = False):
        b, n, _ = points.shape
        x0, y0, z0, x1, y1, z1 = self.lidar_range
        vx, vy, vz = self.voxel_size
        nx = int(round((x1 - x0) / vx))
        ny = int(round((y1 - y0) / vy))
        nz = int(round((z1 - z0) / vz))
        cells = nx * ny * nz + 1

        xi = jnp.floor((points[..., 0] - x0) / vx).astype(jnp.int32)
        yi = jnp.floor((points[..., 1] - y0) / vy).astype(jnp.int32)
        zi = jnp.floor((points[..., 2] - z0) / vz).astype(jnp.int32)
        ok = (
            mask
            & (xi >= 0) & (xi < nx)
            & (yi >= 0) & (yi < ny)
            & (zi >= 0) & (zi < nz)
        )
        ids = jnp.where(ok, (zi * ny + yi) * nx + xi, nx * ny * nz)
        flat_ids = (
            ids + jnp.arange(b, dtype=ids.dtype)[:, None] * cells
        ).reshape(-1)
        order = jnp.argsort(flat_ids)
        flat_ids = flat_ids[order]
        flat_ok = ok.reshape(-1)[order]
        pts = jnp.take(points.reshape(-1, 4), order, axis=0)

        # VFE: per-point linear + norm + relu, then voxel max (same fused
        # formulation as the pillar encoder)
        w = flat_ok.astype(pts.dtype)[:, None]
        feats = PFNLayer(self.vfe_features, norm=self.norm)(
            pts * w, flat_ok, train
        )
        feats = feats * w
        canvas = jax.ops.segment_max(
            feats, flat_ids, num_segments=b * cells, indices_are_sorted=True
        )
        canvas = jnp.maximum(
            jnp.where(jnp.isfinite(canvas), canvas, 0.0), 0.0
        )
        grid = canvas.reshape(b, cells, -1)[:, : nx * ny * nz]
        grid = grid.reshape(b, nz, ny, nx, self.vfe_features)

        # conv middle layers: two 3D convs, stride 2 on z
        h = nn.Conv(
            self.conv3d_features, (3, 3, 3), strides=(2, 1, 1)
        )(grid)
        h = nn.relu(Norm(self.norm)(h, train))
        h = nn.Conv(
            self.conv3d_features, (3, 3, 3), strides=(2, 1, 1)
        )(h)
        h = nn.relu(Norm(self.norm)(h, train))
        bdim, zdim, ydim, xdim, c = h.shape
        return h.transpose(0, 2, 3, 1, 4).reshape(
            bdim, ydim, xdim, zdim * c
        )


@register_model("voxel_net")
class VoxelNet(nn.Module):
    args: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        a = self.args
        norm = a.get("norm", "batch")
        enc = VoxelNetEncoder(
            voxel_size=tuple(a["voxel_size"]),
            lidar_range=tuple(a["lidar_range"]),
            norm=norm,
        )
        bev = enc(batch["points"], batch["point_mask"], train)
        feat = _backbone_from_args(a, norm)(bev, train)
        shrink = _shrink_from_args(a, norm)
        if shrink is not None:
            feat = shrink(feat, train)
        out = DetectionHeads(
            anchor_number=a["anchor_number"],
            use_dir="dir_args" in a,
            num_bins=a.get("dir_args", {}).get("num_bins", 2),
        )(feat)
        out["spatial_features_2d"] = feat
        return out


@register_model("voxel_net_intermediate")
class VoxelNetIntermediate(nn.Module):
    args: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        from .fuse import build_fusion

        a = self.args
        norm = a.get("norm", "batch")
        points = batch["points"]
        pmask = batch["point_mask"]
        b, l = points.shape[:2]
        enc = VoxelNetEncoder(
            voxel_size=tuple(a["voxel_size"]),
            lidar_range=tuple(a["lidar_range"]),
            norm=norm,
        )
        bev = enc(
            points.reshape((b * l,) + points.shape[2:]),
            pmask.reshape((b * l,) + pmask.shape[2:]),
            train,
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
        out = DetectionHeads(
            anchor_number=a["anchor_number"],
            use_dir="dir_args" in a,
            num_bins=a.get("dir_args", {}).get("num_bins", 2),
        )(fused)
        out["spatial_features_2d"] = fused
        return out
