"""Camera geometry utilities (host side, numpy).

Capability parity with reference ``opencood/utils/camera_utils.py``:
depth discretization UD/LID (:137-207), BEV grid derivation gen_dx_bx
(:129), image normalization, and lidar->camera depth-map rendering for
depth supervision.
"""
from __future__ import annotations

import numpy as np


def gen_dx_bx(xbound, ybound, zbound):
    """-> (dx, bx, nx): cell size, first-cell center, cell counts."""
    dx = np.array([row[2] for row in (xbound, ybound, zbound)])
    bx = np.array([row[0] + row[2] / 2.0 for row in (xbound, ybound, zbound)])
    nx = np.array(
        [int(round((row[1] - row[0]) / row[2])) for row in (xbound, ybound, zbound)],
        dtype=np.int64,
    )
    return dx, bx, nx


def depth_discretization(d_min, d_max, num_bins, mode: str) -> np.ndarray:
    """Depth-bin center values. UD uniform; LID linear-increasing."""
    if mode == "UD":
        size = (d_max - d_min) / num_bins
        return d_min + size * np.arange(num_bins)
    if mode == "LID":
        size = 2 * (d_max - d_min) / (num_bins * (1 + num_bins))
        return d_min + size * (np.arange(num_bins) * np.arange(1, 1 + num_bins)) / 2
    raise NotImplementedError(mode)


def bin_depths(depth_map, mode, d_min, d_max, num_bins, target=True):
    """Depth map -> bin indices (+ validity mask when not target)."""
    if mode == "UD":
        size = (d_max - d_min) / num_bins
        idx = (depth_map - d_min) / size
    elif mode == "LID":
        size = 2 * (d_max - d_min) / (num_bins * (1 + num_bins))
        idx = -0.5 + 0.5 * np.sqrt(1 + 8 * (depth_map - d_min) / size)
    else:
        raise NotImplementedError(mode)
    mask = (idx >= 0) & (idx < num_bins) & np.isfinite(idx)
    idx = np.clip(idx, 0, num_bins - 1)
    if target:
        idx = np.where(mask, idx, num_bins)  # out-of-range -> ignore bin
    return np.floor(idx).astype(np.int64), mask


def default_camera_rig(num_cams: int = 4, height: float = 1.9):
    """A simple 4-camera surround rig (synthetic data): yaw 0/90/180/270.

    Returns list of (rot 3x3 cam->agent, trans 3). Camera frame: +z
    forward (optical axis), +x right, +y down — matching the standard
    pinhole convention the intrinsics assume.
    """
    rigs = []
    for i in range(num_cams):
        yaw = np.radians(90.0 * i)
        c, s = np.cos(yaw), np.sin(yaw)
        # agent frame: x forward, y left(ish), z up. camera optical axis ->
        # agent direction (c, s, 0)
        rot = np.array(
            [
                [-s, 0.0, c],
                [c, 0.0, s],
                [0.0, -1.0, 0.0],
            ]
        )
        trans = np.array([0.0, 0.0, height])
        rigs.append((rot, trans))
    return rigs


def default_intrinsics(img_h: int, img_w: int, fov_deg: float = 100.0):
    f = img_w / (2 * np.tan(np.radians(fov_deg) / 2))
    return np.array(
        [[f, 0, img_w / 2], [0, f, img_h / 2], [0, 0, 1.0]]
    )


def render_depth_map(
    points_agent: np.ndarray,
    rot: np.ndarray,
    trans: np.ndarray,
    intrins: np.ndarray,
    img_h: int,
    img_w: int,
    downsample: int,
) -> np.ndarray:
    """Project agent-frame lidar points into a camera, keep nearest depth
    per feature-map pixel. Returns (img_h//ds, img_w//ds) with 0 = empty.

    Used for LSS depth supervision (reference renders full-res depth from
    the point cloud in the camera dataloader path).
    """
    cam_pts = (points_agent[:, :3] - trans) @ rot  # agent -> camera frame
    z = cam_pts[:, 2]
    keep = z > 0.1
    cam_pts = cam_pts[keep]
    z = z[keep]
    uv = cam_pts @ intrins.T
    u = uv[:, 0] / uv[:, 2]
    v = uv[:, 1] / uv[:, 2]
    fh, fw = img_h // downsample, img_w // downsample
    ui = np.floor(u / downsample).astype(np.int64)
    vi = np.floor(v / downsample).astype(np.int64)
    ok = (ui >= 0) & (ui < fw) & (vi >= 0) & (vi < fh)
    depth = np.full((fh, fw), np.inf)
    np.minimum.at(depth, (vi[ok], ui[ok]), z[ok])
    depth[~np.isfinite(depth)] = 0.0
    return depth.astype(np.float32)
