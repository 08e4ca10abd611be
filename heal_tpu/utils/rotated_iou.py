"""Vectorized rotated-rectangle intersection / IoU.

Replaces the reference's shapely polygon loops (opencood/utils/common_utils.py:230-270,
box_utils.nms_rotated) and the CUDA Sutherland-Hodgman clipper
(opencood/pcdet_utils/iou3d_nms/src/iou3d_nms_kernel.cu) with a single
fully-vectorized formulation that runs identically under numpy (host, eval
path) and jax.numpy (device, NMS / IoU-loss path — XLA/TPU friendly: fixed
shapes, no data-dependent control flow).

Algorithm (per box pair, all pairs in parallel) — sort-free and
gather-free, chosen for TPU VPU friendliness: the boundary of A∩B for
convex CCW polygons decomposes into {parts of ∂A inside B} ∪ {parts of ∂B
inside A}. The shoelace area is the line integral ∮ (x dy − y dx)/2,
which is ORDER-INDEPENDENT over directed boundary segments — so each edge
is Liang-Barsky-clipped against the other rectangle's four half-planes and
its segment contribution ½·cross(P(t0), P(t1)) is summed directly.
~32 fused multiply-adds per pair, no sorting, no scatter/gather; exact for
convex polygons, which rect∩rect always is.
"""
from __future__ import annotations

import numpy as np

_EPS = 1e-8


def _xp(*arrays):
    """Pick numpy or jax.numpy based on input types."""
    for a in arrays:
        if not isinstance(a, np.ndarray) and not np.isscalar(a):
            import jax.numpy as jnp

            return jnp
    return np


def box2d_to_corners(boxes, xp=None):
    """(..., 5) [x, y, dx, dy, yaw] -> (..., 4, 2) CCW corners.

    Corner order matches the reference box template
    (opencood/utils/box_utils.py:boxes2d_to_corners2d): (+,-), (+,+), (-,+), (-,-)
    in the box frame, i.e. counter-clockwise.
    """
    xp = xp or _xp(boxes)
    x, y, dx, dy, yaw = (boxes[..., i] for i in range(5))
    template = np.array(
        [[0.5, -0.5], [0.5, 0.5], [-0.5, 0.5], [-0.5, -0.5]], dtype=np.float32
    )  # (4, 2)
    local = xp.stack([dx, dy], axis=-1)[..., None, :] * template  # (..., 4, 2)
    c, s = xp.cos(yaw), xp.sin(yaw)
    cx = local[..., 0] * c[..., None] - local[..., 1] * s[..., None]
    cy = local[..., 0] * s[..., None] + local[..., 1] * c[..., None]
    return xp.stack([cx + x[..., None], cy + y[..., None]], axis=-1)


def polygon_area(corners, xp=None):
    """Shoelace area of (..., K, 2) polygons (positive for CCW)."""
    xp = xp or _xp(corners)
    x = corners[..., 0]
    y = corners[..., 1]
    x2 = xp.roll(x, -1, axis=-1)
    y2 = xp.roll(y, -1, axis=-1)
    return 0.5 * xp.sum(x * y2 - x2 * y, axis=-1)


def _clipped_edge_contributions(ca, cb, xp, include_boundary=True):
    """Line-integral contribution of ∂A∩B: each A edge clipped to B.

    ca, cb: (..., 4, 2) CCW corners. Returns (...,) summed
    ½·cross(P(t0), P(t1)) over A's four clipped edges.

    ``include_boundary`` controls whether an A edge lying exactly ON ∂B
    counts as inside — the two passes use opposite settings so coincident
    boundary segments (identical boxes) are counted exactly once.
    """
    p = ca  # (..., 4, 2) edge starts
    r = xp.roll(ca, -1, axis=-2) - ca  # (..., 4, 2) edge vectors

    b0 = cb  # (..., 4, 2) clip-edge starts
    e = xp.roll(cb, -1, axis=-2) - cb  # (..., 4, 2) clip-edge vectors

    # constraint per (A-edge i, B-edge k): inside iff
    #   cross(e_k, p_i + t r_i - b0_k) >= 0
    # broadcast (..., 4, 1, 2) x (..., 1, 4, 2)
    pi = p[..., :, None, :]
    ri = r[..., :, None, :]
    bk = b0[..., None, :, :]
    ek = e[..., None, :, :]
    num = ek[..., 0] * (pi[..., 1] - bk[..., 1]) - ek[..., 1] * (
        pi[..., 0] - bk[..., 0]
    )  # (..., 4, 4) cross(e, p - b0)
    den = ek[..., 0] * ri[..., 1] - ek[..., 1] * ri[..., 0]  # cross(e, r)

    safe_den = xp.where(xp.abs(den) < _EPS, 1.0, den)
    t_hit = -num / safe_den
    # den > 0: constraint satisfied for t >= t_hit  -> lower bound
    # den < 0: satisfied for t <= t_hit            -> upper bound
    # den ~ 0: satisfied for all t iff num >= 0, else never
    parallel = xp.abs(den) < _EPS
    btol = 1e-6
    par_inside = (num >= -btol) if include_boundary else (num > btol)
    lo = xp.where(
        parallel, xp.where(par_inside, 0.0, 1.0), xp.where(den > 0, t_hit, 0.0)
    )
    hi = xp.where(
        parallel, xp.where(par_inside, 1.0, 0.0), xp.where(den < 0, t_hit, 1.0)
    )
    t0 = xp.clip(xp.max(lo, axis=-1), 0.0, 1.0)  # (..., 4)
    t1 = xp.clip(xp.min(hi, axis=-1), 0.0, 1.0)
    keep = (t1 > t0).astype(ca.dtype)

    p0 = p + t0[..., None] * r  # (..., 4, 2)
    p1 = p + t1[..., None] * r
    contrib = 0.5 * (p0[..., 0] * p1[..., 1] - p1[..., 0] * p0[..., 1])
    return xp.sum(contrib * keep, axis=-1)


def rect_intersection_area(ca, cb, xp=None):
    """Intersection area of two convex CCW quads given corners (..., 4, 2)."""
    xp = xp or _xp(ca, cb)
    area = _clipped_edge_contributions(
        ca, cb, xp, include_boundary=True
    ) + _clipped_edge_contributions(cb, ca, xp, include_boundary=False)
    return xp.maximum(area, 0.0)


def rotated_iou_corners(ca, cb, xp=None):
    """IoU of two rotated rects from corners (..., 4, 2) each."""
    xp = xp or _xp(ca, cb)
    inter = rect_intersection_area(ca, cb, xp)
    area_a = xp.abs(polygon_area(ca, xp))
    area_b = xp.abs(polygon_area(cb, xp))
    union = area_a + area_b - inter
    return inter / xp.maximum(union, _EPS)


def rotated_iou_matrix(corners_a, corners_b, xp=None):
    """Pairwise IoU matrix between (N, 4, 2) and (M, 4, 2) -> (N, M)."""
    xp = xp or _xp(corners_a, corners_b)
    ca = corners_a[:, None]  # (N, 1, 4, 2)
    cb = corners_b[None, :]  # (1, M, 4, 2)
    n, m = corners_a.shape[0], corners_b.shape[0]
    ca = xp.broadcast_to(ca, (n, m, 4, 2))
    cb = xp.broadcast_to(cb, (n, m, 4, 2))
    return rotated_iou_corners(ca, cb, xp)


def aligned_boxes_iou3d(boxes_a, boxes_b, xp=None):
    """Element-wise 3D IoU of rotated boxes (K, 7) in hwl order
    [x, y, z, h, w, l, yaw].

    Replaces the reference's aligned_boxes_iou3d_gpu
    (pcdet_utils/iou3d_nms/iou3d_nms_utils.py:109) used by the
    PointPillarLoss IoU branch: BEV polygon intersection x z-overlap.
    """
    xp = xp or _xp(boxes_a, boxes_b)
    ca = box2d_to_corners(boxes_a[..., [0, 1, 5, 4, 6]], xp)
    cb = box2d_to_corners(boxes_b[..., [0, 1, 5, 4, 6]], xp)
    inter_bev = rect_intersection_area(ca, cb, xp)
    ha, hb = boxes_a[..., 3], boxes_b[..., 3]
    za0, za1 = boxes_a[..., 2] - ha / 2, boxes_a[..., 2] + ha / 2
    zb0, zb1 = boxes_b[..., 2] - hb / 2, boxes_b[..., 2] + hb / 2
    inter_z = xp.maximum(
        xp.minimum(za1, zb1) - xp.maximum(za0, zb0), 0.0
    )
    inter = inter_bev * inter_z
    vol_a = boxes_a[..., 4] * boxes_a[..., 5] * ha
    vol_b = boxes_b[..., 4] * boxes_b[..., 5] * hb
    return inter / xp.maximum(vol_a + vol_b - inter, _EPS)
