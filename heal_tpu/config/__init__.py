"""YAML config system.

Capability parity with reference ``opencood/hypes_yaml/yaml_utils.py``:
the same config schema (see ``exemplar`` configs under heal_tpu/configs/),
the same derived-parameter passes (grid size / anchor W,H,D from lidar range
+ voxel size), and a scientific-notation-safe YAML loader — but parser
dispatch through an explicit registry instead of ``eval``.
"""
from .loader import PARSER_REGISTRY, load_yaml, save_yaml, yaml_parser

__all__ = ["load_yaml", "save_yaml", "yaml_parser", "PARSER_REGISTRY"]
