"""JAX box geometry: corners, decode, projection (device side).

Mirrors heal_tpu.utils.box_np semantics 1:1 (shared conventions are tested
for numpy/JAX agreement) so host labels and device decodes are consistent.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.common import limit_period

_CORNER_TEMPLATE = np.array(
    [
        [1, -1, -1],
        [1, 1, -1],
        [-1, 1, -1],
        [-1, -1, -1],
        [1, -1, 1],
        [1, 1, 1],
        [-1, 1, 1],
        [-1, -1, 1],
    ],
    dtype=np.float32,
) / 2.0


def boxes_to_corners_3d(boxes: jnp.ndarray, order: str) -> jnp.ndarray:
    """(..., 7) -> (..., 8, 3); same template as box_np."""
    if order == "hwl":
        boxes = boxes[..., jnp.array([0, 1, 2, 5, 4, 3, 6])]
    elif order != "lwh":
        raise ValueError(f"unknown order {order!r}")
    dims = boxes[..., None, 3:6] * _CORNER_TEMPLATE  # (..., 8, 3)
    yaw = boxes[..., 6]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    x = dims[..., 0] * c[..., None] - dims[..., 1] * s[..., None]
    y = dims[..., 0] * s[..., None] + dims[..., 1] * c[..., None]
    rot = jnp.stack([x, y, dims[..., 2]], axis=-1)
    return rot + boxes[..., None, 0:3]


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Residual decode; deltas/anchors (..., 7), anchors in hwl order.

    Matches VoxelPostprocessor.delta_to_boxes3d (voxel_postprocessor.py:407):
    xy scaled by anchor BEV diagonal, z by anchor height (hwl index 3),
    dims by exp-ratio, yaw additive.
    """
    d = jnp.sqrt(anchors[..., 4] ** 2 + anchors[..., 5] ** 2)
    xy = deltas[..., 0:2] * d[..., None] + anchors[..., 0:2]
    z = deltas[..., 2:3] * anchors[..., 3:4] + anchors[..., 2:3]
    dims = jnp.exp(deltas[..., 3:6]) * anchors[..., 3:6]
    yaw = deltas[..., 6:7] + anchors[..., 6:7]
    return jnp.concatenate([xy, z, dims, yaw], axis=-1)


def correct_direction(
    yaw: jnp.ndarray,
    dir_labels: jnp.ndarray,
    dir_offset: float = 0.7853,
    num_bins: int = 2,
) -> jnp.ndarray:
    """Snap yaw into the classified direction bin (ref post_process:320-339)."""
    period = 2 * np.pi / num_bins
    dir_rot = limit_period(yaw - dir_offset, 0.0, period)
    yaw = dir_rot + dir_offset + period * dir_labels.astype(yaw.dtype)
    return limit_period(yaw, 0.5, 2 * np.pi)


def project_points(points: jnp.ndarray, tfm: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 3) points through (..., 4, 4) transform."""
    return points @ jnp.swapaxes(tfm[..., :3, :3], -1, -2) + tfm[..., None, :3, 3]


def project_corners(corners: jnp.ndarray, tfm: jnp.ndarray) -> jnp.ndarray:
    """(N, 8, 3) corners through a (4, 4) transform."""
    flat = corners.reshape(-1, 3)
    return project_points(flat, tfm).reshape(corners.shape)
