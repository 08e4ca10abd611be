"""Visualization: BEV detection canvases.

Capability parity with reference ``opencood/visualization`` (simple_vis +
the BEV canvas stack): render point clouds, prediction boxes and GT boxes
to a PNG per frame during inference.
"""
from .simple_vis import visualize

__all__ = ["visualize"]
