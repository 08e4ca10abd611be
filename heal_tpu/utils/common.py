"""Small shared helpers (numpy-side).

Capability parity with reference ``opencood/utils/common_utils.py``
(limit_period :104, update_dict :17, rotate_points_along_z :139), written
from scratch for a numpy/JAX stack.
"""
from __future__ import annotations

import numpy as np


def limit_period(val, offset: float = 0.5, period: float = 2 * np.pi):
    """Wrap ``val`` into ``[-offset*period, (1-offset)*period)``.

    Works for numpy arrays, python scalars and jax arrays (pure ufuncs).
    """
    if isinstance(val, (np.ndarray, float, int)):
        return val - np.floor(val / period + offset) * period
    import jax.numpy as jnp

    return val - jnp.floor(val / period + offset) * period


def update_dict(base: dict, override: dict) -> dict:
    """Recursively override keys of ``base`` with ``override`` in place.

    Mirrors the recursive config-override mechanism the reference uses to
    re-derive anchors when the eval range changes.
    """
    for key, value in override.items():
        if isinstance(value, dict) and isinstance(base.get(key), dict):
            update_dict(base[key], value)
        else:
            base[key] = value
    return base


def rotate_points_along_z(points: np.ndarray, angle: np.ndarray) -> np.ndarray:
    """Rotate batches of points around +z.

    points: (B, N, 3[+C]) ; angle: (B,) radians. Returns same shape.
    """
    cosa = np.cos(angle)
    sina = np.sin(angle)
    zeros = np.zeros_like(angle)
    ones = np.ones_like(angle)
    rot = np.stack(
        [cosa, sina, zeros, -sina, cosa, zeros, zeros, zeros, ones], axis=1
    ).reshape(-1, 3, 3)
    xyz = points[:, :, 0:3] @ rot
    return np.concatenate([xyz, points[:, :, 3:]], axis=-1)


def rotate_points_along_z_2d(points: np.ndarray, angle: np.ndarray) -> np.ndarray:
    """Rotate (N, 2) points by per-point angles (N,) around origin."""
    cosa = np.cos(angle)
    sina = np.sin(angle)
    # row-vector convention: p' = p @ R with R = [[c, s], [-s, c]]
    rot = np.stack([cosa, sina, -sina, cosa], axis=1).reshape(-1, 2, 2)
    return np.einsum("ni,nij->nj", points, rot)
