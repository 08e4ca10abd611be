"""World augmentations for late/early fusion training.

Capability parity with reference data_utils/augmentor (DataAugmentor +
augment_utils): random flip along x/y, global rotation around z, global
scaling — applied jointly to points and GT boxes (late/early fusion only,
as the reference: intermediate fusion keeps raw geometry consistent
across agents).
"""
from __future__ import annotations

import numpy as np


def random_flip(points, boxes, rng, axes=("x",)):
    """Flip along world axes. boxes: (K, 7) lwh with yaw."""
    for axis in axes:
        if rng.random() < 0.5:
            continue
        if axis == "x":  # flip y coordinate
            points[:, 1] = -points[:, 1]
            boxes[:, 1] = -boxes[:, 1]
            boxes[:, 6] = -boxes[:, 6]
        elif axis == "y":  # flip x coordinate
            points[:, 0] = -points[:, 0]
            boxes[:, 0] = -boxes[:, 0]
            boxes[:, 6] = np.pi - boxes[:, 6]
    return points, boxes


def global_rotation(points, boxes, rng, rot_range=(-0.78539816, 0.78539816)):
    angle = rng.uniform(*rot_range)
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s], [s, c]])
    points[:, :2] = points[:, :2] @ rot.T
    boxes[:, :2] = boxes[:, :2] @ rot.T
    boxes[:, 6] += angle
    return points, boxes


def global_scaling(points, boxes, rng, scale_range=(0.95, 1.05)):
    scale = rng.uniform(*scale_range)
    points[:, :3] *= scale
    boxes[:, :6] *= scale
    return points, boxes


class DataAugmentor:
    """Config-driven augmentation chain (ref data_augmentor.py:38-103)."""

    def __init__(self, config: list | None, train: bool = True):
        self.config = config or []
        self.train = train

    def __call__(self, points: np.ndarray, boxes: np.ndarray, seed=None):
        if not self.train or not self.config:
            return points, boxes
        rng = np.random.default_rng(seed)
        points = np.array(points, copy=True)
        boxes = np.array(boxes, copy=True)
        for aug in self.config:
            name = aug["NAME"] if isinstance(aug, dict) else aug
            if name == "random_world_flip":
                axes = aug.get("ALONG_AXIS_LIST", ["x"]) if isinstance(
                    aug, dict
                ) else ["x"]
                points, boxes = random_flip(points, boxes, rng, axes)
            elif name == "random_world_rotation":
                rr = aug.get(
                    "WORLD_ROT_ANGLE", [-0.78539816, 0.78539816]
                ) if isinstance(aug, dict) else [-0.78539816, 0.78539816]
                points, boxes = global_rotation(points, boxes, rng, rr)
            elif name == "random_world_scaling":
                sr = aug.get("WORLD_SCALE_RANGE", [0.95, 1.05]) if isinstance(
                    aug, dict
                ) else [0.95, 1.05]
                points, boxes = global_scaling(points, boxes, rng, sr)
        return points, boxes
