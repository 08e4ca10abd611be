"""Post-processing: anchor generation, target assignment, decode + NMS.

Replaces the reference's ``opencood/data_utils/post_processor`` family.
Host-side label generation is numpy (anchors.py, targets.py); the
inference-time decode → direction-correction → rotated NMS → range-mask
chain is a jit-able fixed-shape JAX pipeline (decode.py).
"""
from .anchors import generate_anchor_box
from .targets import generate_targets

__all__ = ["generate_anchor_box", "generate_targets"]
