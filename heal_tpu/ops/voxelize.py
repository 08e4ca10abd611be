"""Device-side pillarization: fused voxelize + decorate + scatter.

TPU-native replacement for the reference's host-side spconv voxelizer
(data_utils/pre_processor/sp_voxel_preprocessor.py) + PillarVFE gather
(models/sub_modules/pillar_vfe.py) + PointPillarScatter
(models/sub_modules/point_pillar_scatter.py).

Key idea: PointPillars' PFN is linear-per-point -> max-over-pillar, so we
never materialize (num_pillars, max_points, C) gathers. Instead:
  1. per-point pillar id from floor((xy - min) / voxel)  — O(N) vector math
  2. per-pillar point mean via segment_sum + count        — XLA scatter-add
  3. decorated per-point features (xyz, intensity, offset-to-mean,
     offset-to-pillar-center) — matches PillarVFE's 10-channel decoration
  4. (caller) dense matmul over ALL points — big MXU-friendly GEMM
  5. segment_max into the dense (ny*nx, C) BEV canvas     — XLA scatter-max

Static shapes throughout: points are padded to a fixed N with a mask;
invalid/padded points get an out-of-range segment id that scatter drops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def pillar_ids(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    lidar_range,
    voxel_size,
    grid_nx: int,
    grid_ny: int,
):
    """Per-point pillar index into the flattened (ny, nx) BEV grid.

    points: (N, >=3); mask: (N,) bool. Returns (ids, valid): ids in
    [0, ny*nx) for valid in-range points, ny*nx (drop bucket) otherwise.
    """
    x0, y0, z0, x1, y1, z1 = lidar_range
    vx, vy = voxel_size[0], voxel_size[1]
    # f32 binning regardless of the feature dtype: the host presort
    # (data/scene.py _presort) bins in f32 numpy, and bf16 coords round
    # across 0.4 m bin edges (ULP at |x|~51 m is 0.25 m) — the two
    # orderings must agree for the encoder's presorted fast path
    px = points[:, 0].astype(jnp.float32)
    py = points[:, 1].astype(jnp.float32)
    xi = jnp.floor((px - x0) / vx).astype(jnp.int32)
    yi = jnp.floor((py - y0) / vy).astype(jnp.int32)
    in_range = (
        (xi >= 0)
        & (xi < grid_nx)
        & (yi >= 0)
        & (yi < grid_ny)
        & (points[:, 2] >= z0)
        & (points[:, 2] <= z1)
        & mask
    )
    ids = jnp.where(in_range, yi * grid_nx + xi, grid_nx * grid_ny)
    return ids, in_range


def decorate_points(
    points: jnp.ndarray,
    ids: jnp.ndarray,
    valid: jnp.ndarray,
    lidar_range,
    voxel_size,
    grid_nx: int,
    grid_ny: int,
    use_absolute_xyz: bool = True,
    with_distance: bool = False,
):
    """Build the PillarVFE-decorated per-point features.

    points: (N, 4) [x y z intensity]. Returns (N, C) with C = 10 by default
    (4 raw + 3 cluster-offset + 3 center-offset), mirroring PillarVFE's
    feature assembly (pillar_vfe.py:110-147).
    """
    num_cells = grid_nx * grid_ny
    w = valid.astype(points.dtype)[:, None]
    xyz = points[:, :3] * w
    seg_sum = jax.ops.segment_sum(xyz, ids, num_segments=num_cells + 1)
    seg_cnt = jax.ops.segment_sum(w, ids, num_segments=num_cells + 1)
    mean_per_pillar = seg_sum / jnp.maximum(seg_cnt, 1.0)
    f_cluster = points[:, :3] - mean_per_pillar[ids]

    x0, y0, z0 = lidar_range[0], lidar_range[1], lidar_range[2]
    vx, vy, vz = voxel_size
    xi = ids % grid_nx
    yi = ids // grid_nx
    cx = xi.astype(points.dtype) * vx + (x0 + vx / 2)
    cy = yi.astype(points.dtype) * vy + (y0 + vy / 2)
    cz = jnp.full_like(cx, z0 + vz / 2)  # single z pillar layer
    f_center = points[:, :3] - jnp.stack([cx, cy, cz], axis=-1)

    feats = [points if use_absolute_xyz else points[:, 3:], f_cluster, f_center]
    if with_distance:
        feats.append(jnp.linalg.norm(points[:, :3], axis=-1, keepdims=True))
    out = jnp.concatenate(feats, axis=-1)
    return out * w


def scatter_max_to_bev(
    point_features: jnp.ndarray,
    ids: jnp.ndarray,
    valid: jnp.ndarray,
    grid_nx: int,
    grid_ny: int,
):
    """Max-pool per-point features into the dense BEV canvas.

    point_features: (N, C) post-PFN activations (assumed >= 0 after ReLU, as
    in the reference where empty pillars are exactly zero).
    Returns (ny, nx, C) NHWC canvas.
    """
    num_cells = grid_nx * grid_ny
    feats = point_features * valid.astype(point_features.dtype)[:, None]
    canvas = jax.ops.segment_max(
        feats, ids, num_segments=num_cells + 1
    )
    # segment_max yields -inf for empty segments; empty pillars are zero in
    # the reference's dense canvas.
    canvas = jnp.where(jnp.isfinite(canvas), canvas, 0.0)
    canvas = jnp.maximum(canvas, 0.0)
    return canvas[:num_cells].reshape(grid_ny, grid_nx, -1)


@partial(
    jax.jit,
    static_argnames=("grid_nx", "grid_ny", "max_points_per_pillar"),
)
def cap_points_per_pillar(
    ids: jnp.ndarray,
    valid: jnp.ndarray,
    grid_nx: int,
    grid_ny: int,
    max_points_per_pillar: int = 32,
):
    """Optionally drop points beyond a per-pillar cap (parity with the
    reference's max_points_per_voxel). Rank within pillar via sorted ids.

    Returns updated valid mask.
    """
    n = ids.shape[0]
    order = jnp.argsort(ids, stable=True)
    sorted_ids = ids[order]
    idx = jnp.arange(n, dtype=jnp.int32)
    run_id = jnp.concatenate(
        [
            jnp.zeros(1, dtype=jnp.int32),
            jnp.cumsum((sorted_ids[1:] != sorted_ids[:-1]).astype(jnp.int32)),
        ]
    )  # (n,) run index per sorted position
    run_start = jnp.full(n, n, dtype=jnp.int32).at[run_id].min(idx)
    rank_sorted = idx - run_start[run_id]
    keep_sorted = rank_sorted < max_points_per_pillar
    keep = jnp.zeros(n, dtype=bool).at[order].set(keep_sorted)
    return valid & keep
