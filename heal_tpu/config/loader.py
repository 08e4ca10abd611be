"""YAML loading + derived-parameter passes.

Reference semantics: opencood/hypes_yaml/yaml_utils.py — load_yaml (:14,
scientific-notation-safe resolver, dispatch on the ``yaml_parser`` key),
load_general_params (:337), load_point_pillar_params (:97),
load_second_params (:140), load_voxel_params (:52), save_yaml (:234).
"""
from __future__ import annotations

import math
import os
import re

import numpy as np
import yaml

PARSER_REGISTRY: dict = {}


def yaml_parser(name: str):
    """Register a derived-parameter pass under ``name``."""

    def deco(fn):
        PARSER_REGISTRY[name] = fn
        return fn

    return deco


def _make_loader():
    loader = yaml.SafeLoader
    loader.add_implicit_resolver(
        "tag:yaml.org,2002:float",
        re.compile(
            """^(?:
         [-+]?(?:[0-9][0-9_]*)\\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
        |\\.[0-9_]+(?:[eE][-+][0-9]+)?
        |[-+]?[0-9][0-9_]*(?::[0-5]?[0-9])+\\.[0-9_]*
        |[-+]?\\.(?:inf|Inf|INF)
        |\\.(?:nan|NaN|NAN))$""",
            re.X,
        ),
        list("-+0123456789."),
    )
    return loader


def load_yaml(file: str, model_dir: str | None = None) -> dict:
    """Load a config; if ``model_dir`` is given, its config.yaml wins."""
    if model_dir:
        candidate = os.path.join(model_dir, "config.yaml")
        if os.path.exists(candidate):
            file = candidate
    with open(file, "r") as stream:
        param = yaml.load(stream, Loader=_make_loader())
    parser_name = param.get("yaml_parser")
    if parser_name:
        if parser_name not in PARSER_REGISTRY:
            raise KeyError(
                f"unknown yaml_parser {parser_name!r}; "
                f"registered: {sorted(PARSER_REGISTRY)}"
            )
        param = PARSER_REGISTRY[parser_name](param)
    return param


def save_yaml(data: dict, path: str) -> None:
    """Dump a config dict (numpy scalars/arrays converted to python)."""

    def _clean(obj):
        if isinstance(obj, dict):
            return {k: _clean(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return [_clean(v) for v in obj]
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        if isinstance(obj, np.generic):
            return obj.item()
        return obj

    with open(path, "w") as f:
        yaml.safe_dump(_clean(data), f, sort_keys=False)


def _derive_grid_and_anchors(param: dict, set_grid_key: str | None = None) -> dict:
    """Shared derivation: voxel grid size + anchor-map W/H/D."""
    cav_lidar_range = param["preprocess"]["cav_lidar_range"]
    voxel_size = param["preprocess"]["args"]["voxel_size"]

    grid_size = np.round(
        (np.array(cav_lidar_range[3:6]) - np.array(cav_lidar_range[0:3]))
        / np.array(voxel_size)
    ).astype(np.int64)

    if set_grid_key is not None:
        param["model"]["args"].setdefault(set_grid_key, {})
        param["model"]["args"][set_grid_key]["grid_size"] = grid_size

    anchor_args = param["postprocess"].setdefault("anchor_args", {})
    vw, vh, vd = voxel_size
    anchor_args["vw"] = vw
    anchor_args["vh"] = vh
    anchor_args["vd"] = vd
    # W spans lidar x; H spans lidar y (image-style naming, as reference)
    anchor_args["W"] = math.ceil((cav_lidar_range[3] - cav_lidar_range[0]) / vw)
    anchor_args["H"] = math.ceil((cav_lidar_range[4] - cav_lidar_range[1]) / vh)
    anchor_args["D"] = math.ceil((cav_lidar_range[5] - cav_lidar_range[2]) / vd)
    anchor_args.setdefault("cav_lidar_range", cav_lidar_range)
    # two-stage models decode stage-1 proposals in-model and need the
    # derived anchor grid in their args
    if param.get("model", {}).get("core_method") in ("fpvrcnn",):
        param["model"]["args"]["anchor_args"] = anchor_args
        param["model"]["args"].setdefault(
            "order", param["postprocess"].get("order", "hwl")
        )
    return param


@yaml_parser("load_general_params")
def load_general_params(param: dict) -> dict:
    """Anchor W/H/D derivation used by all heter (HEAL) configs."""
    return _derive_grid_and_anchors(param)


@yaml_parser("load_point_pillar_params")
def load_point_pillar_params(param: dict) -> dict:
    """+ grid_size injected into model.args.point_pillar_scatter."""
    return _derive_grid_and_anchors(param, set_grid_key="point_pillar_scatter")


@yaml_parser("load_second_params")
def load_second_params(param: dict) -> dict:
    """+ grid_size for the sparse 3D backbone."""
    return _derive_grid_and_anchors(param, set_grid_key="backbone_3d")


@yaml_parser("load_voxel_params")
def load_voxel_params(param: dict) -> dict:
    """VoxelNet-family derivation (same anchor math, W from full stride)."""
    return _derive_grid_and_anchors(param)


@yaml_parser("load_point_pillar_params_stage1")
def load_point_pillar_params_stage1(param: dict) -> dict:
    """Stage-1 variant (box-align pre-calc configs)."""
    param = _derive_grid_and_anchors(param, set_grid_key="point_pillar_scatter")
    if "box_align_pre_calc" in param:
        param["box_align_pre_calc"]["stage1_postprocessor_config"].update(
            {"anchor_args": param["postprocess"]["anchor_args"]}
        )
    return param


@yaml_parser("load_bev_params")
def load_bev_params(param: dict) -> dict:
    """PIXOR BEV rasterization derivation (geometry grid + label shape)."""
    res = param["preprocess"]["args"]["res"]
    L1, W1, H1, L2, W2, H2 = param["preprocess"]["cav_lidar_range"]
    downsample_rate = param["preprocess"]["args"]["downsample_rate"]
    def _dim(a, b):
        return int((b - a) / res)
    input_shape = (_dim(L1, L2), _dim(W1, W2), _dim(H1, H2) + 1)
    label_shape = (
        int(input_shape[0] / downsample_rate),
        int(input_shape[1] / downsample_rate),
        7,
    )
    param["preprocess"]["args"]["input_shape"] = list(input_shape)
    param["preprocess"]["args"]["label_shape"] = list(label_shape)
    param["postprocess"].setdefault("anchor_args", {})
    param["postprocess"]["anchor_args"]["cav_lidar_range"] = param[
        "preprocess"
    ]["cav_lidar_range"]
    return param


@yaml_parser("load_lift_splat_shoot_params")
def load_lift_splat_shoot_params(param: dict) -> dict:
    """Camera LSS derivation: anchor map from grid_conf resolution."""
    grid_conf = param["fusion"]["args"]["grid_conf"]
    xbound = grid_conf["xbound"]
    ybound = grid_conf["ybound"]
    anchor_args = param["postprocess"].setdefault("anchor_args", {})
    anchor_args["vw"] = xbound[2]
    anchor_args["vh"] = ybound[2]
    anchor_args["W"] = math.ceil((xbound[1] - xbound[0]) / xbound[2])
    anchor_args["H"] = math.ceil((ybound[1] - ybound[0]) / ybound[2])
    anchor_args.setdefault(
        "cav_lidar_range",
        [xbound[0], ybound[0], -3, xbound[1], ybound[1], 1],
    )
    return param
