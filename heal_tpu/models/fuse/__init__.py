"""Collaborative fusion modules.

Capability parity with reference ``opencood/models/fuse_modules``: each
method fuses per-agent BEV maps (warped into the ego frame) into one map.
TPU-first contract: features are (B, L, H, W, C) with a (B, L) agent mask —
fixed L replaces the ragged ``record_len`` concat; padded slots are masked
out of every reduction.
"""
from .fusion_in_one import (
    AttFusion,
    DiscoFusion,
    MaxFusion,
    V2VNetFusion,
    Where2commFusion,
    Who2comFusion,
    build_fusion,
)
from .pyramid import PyramidFusion, weighted_fuse

__all__ = [
    "MaxFusion",
    "AttFusion",
    "DiscoFusion",
    "V2VNetFusion",
    "Where2commFusion",
    "Who2comFusion",
    "PyramidFusion",
    "weighted_fuse",
    "build_fusion",
]
