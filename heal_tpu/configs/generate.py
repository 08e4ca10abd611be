"""Generate the experiment config corpus.

Mirrors the reference's hypes_yaml families (opv2v / dairv2x / v2xsim x
{single, late, early, intermediate x 8 fusion methods, HEAL stages,
camera-only}) at real OPV2V scale. Run:

    python -m heal_tpu.configs.generate [--out heal_tpu/configs]

Modality palette (OPV2V-H convention):
  m1 = 64-line lidar + PointPillars   m2 = 4-camera rig + LSS
  m3 = 32-line lidar + SECOND         m4 = 16-line lidar + PointPillars
"""
from __future__ import annotations

import argparse
import copy
import os

import yaml

CAV_RANGE = [-102.4, -51.2, -3, 102.4, 51.2, 1]
VOXEL = [0.4, 0.4, 4]
ANCHOR = {
    "l": 3.9, "w": 1.6, "h": 1.56, "r": [0, 90],
    "feature_stride": 2, "num": 2,
}
DIR_ARGS = {"dir_offset": 0.7853, "num_bins": 2, "anchor_yaw": [0, 90]}

GRID_CONF_CAM = {
    "xbound": [-51.2, 51.2, 0.8],
    "ybound": [-51.2, 51.2, 0.8],
    "zbound": [-10, 10, 20.0],
    "ddiscr": [2, 50, 48],
    "mode": "LID",
}
DATA_AUG_CAM = {
    "final_dim": [384, 512],
    "cams": ["camera0", "camera1", "camera2", "camera3"],
    "Ncams": 4,
}


def pp_encoder(num_filters=64):
    return {
        "voxel_size": VOXEL,
        "lidar_range": CAV_RANGE,
        "pillar_vfe": {
            "use_norm": True,
            "with_distance": False,
            "use_absolute_xyz": True,
            "num_filters": [num_filters],
        },
        "point_pillar_scatter": {"num_features": num_filters},
    }


def modality_block(m: str):
    if m in ("m1", "m4"):
        return {
            "sensor_type": "lidar",
            "core_method": "point_pillar",
            "preprocess": {
                "core_method": "SpVoxelPreprocessor",
                "args": {
                    "voxel_size": VOXEL,
                    "max_points_per_voxel": 32,
                    "max_voxel_train": 32000,
                    "max_voxel_test": 70000,
                },
                "cav_lidar_range": CAV_RANGE,
            },
        }
    if m == "m2":
        return {
            "sensor_type": "camera",
            "core_method": "lift_splat_shoot",
            "grid_conf": GRID_CONF_CAM,
            "data_aug_conf": DATA_AUG_CAM,
        }
    if m == "m3":
        return {
            "sensor_type": "lidar",
            "core_method": "second",
            "preprocess": {
                "core_method": "SpVoxelPreprocessor",
                "args": {
                    "voxel_size": [0.1, 0.1, 0.1],
                    "max_points_per_voxel": 5,
                },
                "cav_lidar_range": CAV_RANGE,
            },
        }
    raise KeyError(m)


def model_branch(m: str):
    if m in ("m1", "m4"):
        return {
            "core_method": "point_pillar",
            "sensor_type": "lidar",
            "encoder_args": pp_encoder(),
            "backbone_args": {
                "layer_nums": [3],
                "layer_strides": [2],
                "num_filters": [64],
            },
            "aligner_args": {"core_method": "identity" if m == "m1" else "res3x3",
                             "args": {"num_of_blocks": 3}},
        }
    if m == "m2":
        return {
            "core_method": "lift_splat_shoot",
            "sensor_type": "camera",
            "encoder_args": {
                "grid_conf": GRID_CONF_CAM,
                "data_aug_conf": DATA_AUG_CAM,
                "img_downsample": 16,
                "img_features": 64,
                "depth_supervision": True,
            },
            "camera_mask_args": {"grid_conf": GRID_CONF_CAM},
            "backbone_args": {
                "layer_nums": [3],
                "layer_strides": [1],
                "num_filters": [64],
            },
            "aligner_args": {"core_method": "convnext",
                             "args": {"num_of_blocks": 3}},
        }
    if m == "m3":
        return {
            "core_method": "second",
            "sensor_type": "lidar",
            "encoder_args": {
                "voxel_size": [0.1, 0.1, 0.1],
                "lidar_range": CAV_RANGE,
                "presorted": True,
                # column capacities sized for real OPV2V 64-line density
                # (~20k in-range points -> <= 20k active columns at L0)
                "second": {"channels": [16, 32, 64, 64],
                           "max_voxels": [24000, 16000, 12000, 8000]},
            },
            "backbone_args": {
                "layer_nums": [3],
                "layer_strides": [1],
                "num_filters": [64],
            },
            "aligner_args": {"core_method": "res3x3",
                             "args": {"num_of_blocks": 3}},
        }
    raise KeyError(m)


def base_cfg(name: str, dataset: str, fusion: str) -> dict:
    return {
        "name": name,
        "root_dir": f"dataset/{dataset.upper()}/train",
        "validate_dir": f"dataset/{dataset.upper()}/validate",
        "test_dir": f"dataset/{dataset.upper()}/test",
        "yaml_parser": "load_general_params",
        "train_params": {
            "batch_size": 4, "epoches": 30, "eval_freq": 2,
            "save_freq": 2, "max_cav": 5 if dataset != "dairv2x" else 2,
        },
        "comm_range": 70,
        "input_source": ["lidar"],
        "label_type": "lidar",
        "cav_lidar_range": CAV_RANGE,
        "fusion": {
            "core_method": fusion,
            "dataset": dataset,
            "args": {"proj_first": False},
        },
        "preprocess": {
            "core_method": "SpVoxelPreprocessor",
            "args": {"voxel_size": VOXEL, "max_points": 30000},
            "cav_lidar_range": CAV_RANGE,
        },
        "postprocess": {
            "core_method": "VoxelPostprocessor",
            "gt_range": CAV_RANGE,
            "anchor_args": dict(ANCHOR, cav_lidar_range=CAV_RANGE),
            "target_args": {
                "pos_threshold": 0.6,
                "neg_threshold": 0.45,
                "score_threshold": 0.2,
            },
            "order": "hwl",
            "max_num": 100,
            "nms_thresh": 0.15,
            "dir_args": DIR_ARGS,
        },
        "loss": {
            "core_method": "point_pillar_loss",
            "args": {
                "pos_cls_weight": 2.0,
                "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0},
                "reg": {"sigma": 3.0, "weight": 2.0},
                "dir": {"weight": 0.2, "args": DIR_ARGS},
            },
        },
        "optimizer": {
            "core_method": "Adam",
            "lr": 0.002,
            "args": {"eps": 1e-10, "weight_decay": 1e-4},
        },
        "lr_scheduler": {
            "core_method": "multistep",
            "gamma": 0.1,
            "step_size": [15, 25],
        },
    }


def pp_model(fusion_method=None):
    args = dict(
        pp_encoder(),
        anchor_number=2,
        dir_args=DIR_ARGS,
        base_bev_backbone={
            "resnet": True,
            "layer_nums": [3, 4, 5],
            "layer_strides": [2, 2, 2],
            "num_filters": [64, 128, 256],
            "upsample_strides": [1, 2, 4],
            "num_upsample_filter": [128, 128, 128],
        },
        shrink_header={
            "kernal_size": [3], "stride": [1], "padding": [1],
            "dim": [256], "input_dim": 384,
        },
    )
    if fusion_method:
        args["fusion_method"] = fusion_method
        args[fusion_method] = {"in_channels": 256, "feat_dim": 256}
        if fusion_method == "v2vnet":
            args["v2vnet"] = {
                "in_channels": 256, "num_iteration": 2,
                "agg_operator": "avg", "gru_flag": True,
                "conv_gru": {"kernel_size": [[3, 3]], "num_layers": 1},
            }
        if fusion_method == "v2xvit":
            args["v2xvit"] = {"depth": 3, "dropout": 0.3}
        if fusion_method == "cobevt":
            args["cobevt"] = {
                "input_dim": 256, "window_size": 8, "depth": 2,
                "drop_out": 0.1,
            }
        if fusion_method == "when2com":
            args["when2com"] = {
                "in_channels": 256, "query_size": 32, "key_size": 256,
                "mode": "activated", "threshold": 0.2,
            }
        if fusion_method == "transformer":
            args["transformer"] = {"in_channels": 256, "n_head": 8}
        return {"core_method": "point_pillar_baseline", "args": args}
    return {"core_method": "point_pillar", "args": args}


def heal_model(modalities, supervise_single=True, collab=True):
    args = {
        "lidar_range": CAV_RANGE,
        "supervise_single": supervise_single,
        "norm": "batch",
        "fusion_backbone": {
            "resnext": True,
            "layer_nums": [3, 5, 8],
            "layer_strides": [1, 2, 2],
            "num_filters": [64, 128, 256],
            "upsample_strides": [1, 2, 4],
            "num_upsample_filter": [128, 128, 128],
            "anchor_number": 2,
        },
        "shrink_header": {
            "kernal_size": [3], "stride": [1], "padding": [1],
            "dim": [256], "input_dim": 384,
        },
        "in_head": 256,
        "anchor_number": 2,
        "dir_args": DIR_ARGS,
    }
    for m in modalities:
        args[m] = model_branch(m)
    return {
        "core_method": (
            "heter_pyramid_collab" if collab else "heter_pyramid_single"
        ),
        "args": args,
    }


PYRAMID_LOSS = {
    "core_method": "point_pillar_pyramid_loss",
    "args": {
        "pos_cls_weight": 2.0,
        "single_weight": 1.0,
        "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0},
        "reg": {"sigma": 3.0, "weight": 2.0},
        "dir": {"weight": 0.2, "args": DIR_ARGS},
        "depth": {"weight": 1.0},
        "pyramid": {
            "relative_downsample": [1, 2, 4],
            "weight": [0.4, 0.2, 0.1],
        },
    },
}


def heter_block(modalities, ego="m1", mapping=None):
    return {
        "assignment_path": "modality_assign/opv2v_4modality.json",
        "ego_modality": ego,
        "lidar_channels_dict": {"m4": 16},
        "mapping_dict": mapping
        or {m: m for m in ("m1", "m2", "m3", "m4")},
        "modality_setting": {m: modality_block(m) for m in modalities},
    }


def write(cfg: dict, path: str):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)


# ---------------------------------------------------------------------------
# full-breadth families (mirrors the reference hypes_yaml tree: per-dataset
# {Single, LiDAROnly, CameraOnly, MoreModality end2end, HEAL} — ref
# hypes_yaml/{opv2v,dairv2x,v2xset,v2xsim2}/, 106 files)
# ---------------------------------------------------------------------------

# reference family name -> our fusion method key
E2E_METHODS = {
    "attfuse": "att",
    "fcooper": "max",
    "disconet": "disconet",
    "cobevt": "cobevt",
    "v2vnet": "v2vnet",
    "v2xvit": "v2xvit",
}


def _dataset_paths(cfg, dataset):
    if dataset == "dairv2x":
        cfg["root_dir"] = "dataset/dairv2x/train.json"
        cfg["validate_dir"] = "dataset/dairv2x/val.json"
        cfg["test_dir"] = "dataset/dairv2x/val.json"
        cfg["data_dir"] = "dataset/dairv2x"
    elif dataset == "v2xsim":
        cfg["root_dir"] = "dataset/v2xsim/train_infos.pkl"
        cfg["validate_dir"] = "dataset/v2xsim/val_infos.pkl"
        cfg["test_dir"] = "dataset/v2xsim/test_infos.pkl"
    return cfg


def _assignment(dataset):
    name = "v2xset" if dataset == "v2xset" else "opv2v"
    return f"modality_assign/{name}_4modality.json"


def e2e_baseline_cfg(dataset, mods, method, name):
    """End-to-end heterogeneous baseline: heter_model_baseline with the
    given fusion (ref MoreModality/{2,3,4}_modality_end2end_training)."""
    cfg = base_cfg(name, dataset, "intermediateheter")
    _dataset_paths(cfg, dataset)
    ego = mods[0]
    mapping = {
        k: (k if k in mods else mods[0]) for k in ("m1", "m2", "m3", "m4")
    }
    cfg["heter"] = heter_block(mods, ego=ego, mapping=mapping)
    cfg["heter"]["assignment_path"] = _assignment(dataset)
    model = heal_model(mods)
    model["core_method"] = "heter_model_baseline"
    model["args"].pop("fusion_backbone")
    model["args"]["fusion_method"] = method
    margs = {"in_channels": 64}
    if method == "cobevt":
        margs = {"input_dim": 64, "window_size": 8, "depth": 3,
                 "drop_out": 0.1}
    if method == "v2xvit":
        margs = {"depth": 2, "num_types": 5, "dropout": 0.3}
    if method == "v2vnet":
        margs = {"in_channels": 64, "num_iteration": 2,
                 "agg_operator": "avg", "gru_flag": True}
    if method == "where2comm":
        margs = {"in_channels": 64, "threshold": 0.01}
    model["args"][method] = margs
    model["args"]["shrink_header"]["input_dim"] = 64
    model["args"]["shrink_header"]["dim"] = [64]
    model["args"]["in_head"] = 64
    cfg["model"] = model
    if all(modality_block(m)["sensor_type"] == "camera" for m in mods):
        cfg["input_source"] = ["camera"]
        cfg["label_type"] = "camera"
    elif any(modality_block(m)["sensor_type"] == "camera" for m in mods):
        cfg["input_source"] = ["lidar", "camera"]
    if dataset == "dairv2x":
        cfg["train_params"]["max_cav"] = 2
    return cfg


def coalign_cfg(dataset, mods, name):
    """CoAlign = multiscale attention fusion + pose-graph box alignment
    (ref *_coalign.yaml: heter_model_baseline_ms + box_align)."""
    cfg = base_cfg(name, dataset, "intermediateheter")
    _dataset_paths(cfg, dataset)
    mapping = {
        k: (k if k in mods else mods[0]) for k in ("m1", "m2", "m3", "m4")
    }
    cfg["heter"] = heter_block(mods, ego=mods[0], mapping=mapping)
    cfg["heter"]["assignment_path"] = _assignment(dataset)
    model = heal_model(mods)
    model["core_method"] = "heter_model_baseline_ms"
    model["args"]["fusion_method"] = "att"
    model["args"]["att"] = {"feat_dim": 64}
    model["args"]["fusion_backbone"] = {
        "layer_nums": [3, 5], "layer_strides": [1, 2],
        "num_filters": [64, 128], "upsample_strides": [1, 2],
        "num_upsample_filter": [128, 128],
    }
    model["args"]["shrink_header"]["input_dim"] = 256
    cfg["model"] = model
    cfg["box_align"] = {"args": {"landmark_thresh": 2.0, "iterations": 10}}
    if "m2" in mods:
        cfg["input_source"] = ["lidar", "camera"]
    if dataset == "dairv2x":
        cfg["train_params"]["max_cav"] = 2
    return cfg


def pyramid_cfg(dataset, mods, name, assignment=None):
    """Pyramid-fusion collab (HEAL base) over the given modalities."""
    cfg = base_cfg(name, dataset, "intermediateheter")
    _dataset_paths(cfg, dataset)
    mapping = {
        k: (k if k in mods else mods[0]) for k in ("m1", "m2", "m3", "m4")
    }
    cfg["heter"] = heter_block(mods, ego=mods[0], mapping=mapping)
    cfg["heter"]["assignment_path"] = assignment or _assignment(dataset)
    cfg["model"] = heal_model(mods)
    cfg["loss"] = PYRAMID_LOSS
    if "m2" in mods:
        cfg["input_source"] = (
            ["camera"] if mods == ["m2"] else ["lidar", "camera"]
        )
    if dataset == "dairv2x":
        cfg["train_params"]["max_cav"] = 2
    return cfg


def single_pretrain_cfg(dataset, m, name):
    """Per-modality single-agent pretrain: lateheter + heter_model_late
    (ref {opv2v,v2xset,dairv2x}/Single/*_pretrain.yaml)."""
    cfg = base_cfg(name, dataset, "lateheter")
    _dataset_paths(cfg, dataset)
    cfg["heter"] = heter_block(
        [m], ego=m, mapping={k: m for k in ("m1", "m2", "m3", "m4")}
    )
    cfg["heter"]["assignment_path"] = _assignment(dataset)
    cfg["train_params"]["max_cav"] = 1
    model = heal_model([m])
    model["core_method"] = "heter_model_late"
    model["args"].pop("fusion_backbone")
    model["args"]["shrink_header"]["input_dim"] = 64
    model["args"]["shrink_header"]["dim"] = [64]
    model["args"]["in_head"] = 64
    cfg["model"] = model
    if m == "m2":
        cfg["input_source"] = ["camera"]
        cfg["label_type"] = "camera"
    return cfg


def emit_full_breadth(out_dir: str):
    """The family grid beyond the hand-curated configs in main()."""
    # ---- opv2v LiDAROnly coalign
    write(
        coalign_cfg("opv2v", ["m1"], "opv2v_lidar_coalign"),
        f"{out_dir}/opv2v/lidar_only/coalign.yaml",
    )
    # ---- opv2v CameraOnly (all-m2 alliances, every fusion family)
    for ref_name, method in E2E_METHODS.items():
        write(
            e2e_baseline_cfg(
                "opv2v", ["m2"], method, f"opv2v_camera_{ref_name}"
            ),
            f"{out_dir}/opv2v/camera_only/{ref_name}.yaml",
        )
    write(
        coalign_cfg("opv2v", ["m2"], "opv2v_camera_coalign"),
        f"{out_dir}/opv2v/camera_only/coalign.yaml",
    )
    # ---- opv2v Single per-modality pretrains
    for m in ("m1", "m2", "m3", "m4"):
        write(
            single_pretrain_cfg("opv2v", m, f"opv2v_single_{m}_pretrain"),
            f"{out_dir}/opv2v/single/{m}_pretrain.yaml",
        )
    # ---- opv2v MoreModality end2end grids
    for mods in (["m1", "m2"], ["m1", "m2", "m3"],
                 ["m1", "m2", "m3", "m4"]):
        tag = "".join(mods)
        for ref_name, method in E2E_METHODS.items():
            path = f"{out_dir}/opv2v/more_modality/{tag}_{ref_name}.yaml"
            alias = f"{out_dir}/opv2v/more_modality/{tag}_{method}.yaml"
            if os.path.exists(alias):  # hand-curated earlier
                continue
            write(
                e2e_baseline_cfg(
                    "opv2v", mods, method, f"opv2v_{tag}_{ref_name}"
                ),
                path,
            )
        write(
            coalign_cfg("opv2v", mods, f"opv2v_{tag}_coalign"),
            f"{out_dir}/opv2v/more_modality/{tag}_coalign.yaml",
        )
    write(
        pyramid_cfg("opv2v", ["m1", "m2"], "opv2v_m1m2_pyramid"),
        f"{out_dir}/opv2v/more_modality/m1m2_pyramid.yaml",
    )
    # ---- opv2v HEAL: stage-1 bases for every modality + stage-2 m1
    for m in ("m2", "m3", "m4"):
        cfg = pyramid_cfg("opv2v", [m], f"Pyramid_{m}_base")
        write(cfg, f"{out_dir}/opv2v/heal/stage1/{m}_pyramid.yaml")
    cfg = base_cfg("Pyramid_m1_single", "opv2v", "intermediateheter")
    cfg["heter"] = heter_block(
        ["m1"], ego="m1", mapping={k: "m1" for k in ("m1", "m2", "m3", "m4")}
    )
    cfg["train_params"]["max_cav"] = 1
    cfg["model"] = heal_model(["m1"], supervise_single=False, collab=False)
    cfg["loss"] = PYRAMID_LOSS
    write(cfg, f"{out_dir}/opv2v/heal/stage2/m1_alignto_m1.yaml")

    # ---- dairv2x: Single + LiDAROnly + CameraOnly + MoreModality + HEAL
    for m, fname in (("m1", "m1"), ("m2", "m2_lss"), ("m3", "m3_second")):
        write(
            single_pretrain_cfg("dairv2x", m, f"dair_single_{fname}"),
            f"{out_dir}/dairv2x/single/{fname}.yaml",
        )
    for ref_name, method in E2E_METHODS.items():
        write(
            e2e_baseline_cfg(
                "dairv2x", ["m1"], method, f"dair_lidar_{ref_name}"
            ),
            f"{out_dir}/dairv2x/lidar_only/{ref_name}.yaml",
        )
        write(
            e2e_baseline_cfg(
                "dairv2x", ["m2"], method, f"dair_camera_{ref_name}"
            ),
            f"{out_dir}/dairv2x/camera_only/{ref_name}.yaml",
        )
        write(
            e2e_baseline_cfg(
                "dairv2x", ["m1", "m2"], method,
                f"dair_lidar_camera_{ref_name}",
            ),
            f"{out_dir}/dairv2x/more_modality/m1m2_{ref_name}.yaml",
        )
    write(
        coalign_cfg("dairv2x", ["m1"], "dair_lidar_coalign"),
        f"{out_dir}/dairv2x/lidar_only/coalign.yaml",
    )
    write(
        coalign_cfg("dairv2x", ["m2"], "dair_camera_coalign"),
        f"{out_dir}/dairv2x/camera_only/coalign.yaml",
    )
    write(
        coalign_cfg("dairv2x", ["m1", "m2"], "dair_m1m2_coalign"),
        f"{out_dir}/dairv2x/more_modality/m1m2_coalign.yaml",
    )
    write(
        pyramid_cfg("dairv2x", ["m2"], "dair_camera_pyramid"),
        f"{out_dir}/dairv2x/camera_only/pyramid.yaml",
    )
    write(
        pyramid_cfg("dairv2x", ["m1", "m2"], "dair_m1m2_pyramid"),
        f"{out_dir}/dairv2x/more_modality/m1m2_pyramid.yaml",
    )
    # HEAL on DAIR: stage2 per type + final m1m2
    for m in ("m2", "m3", "m4"):
        cfg = base_cfg(
            f"dair_{m}_single_pyramid", "dairv2x", "intermediateheter"
        )
        _dataset_paths(cfg, "dairv2x")
        cfg["heter"] = heter_block(
            [m], ego=m, mapping={k: m for k in ("m1", "m2", "m3", "m4")}
        )
        cfg["train_params"]["max_cav"] = 1
        cfg["model"] = heal_model([m], supervise_single=False, collab=False)
        cfg["loss"] = PYRAMID_LOSS
        if m == "m2":
            cfg["input_source"] = ["camera"]
        write(cfg, f"{out_dir}/dairv2x/heal/stage2/{m}_single_pyramid.yaml")
    write(
        pyramid_cfg("dairv2x", ["m1", "m2"], "dair_final_m1m2"),
        f"{out_dir}/dairv2x/heal/final_infer/m1m2.yaml",
    )

    # ---- v2xset breadth
    for m in ("m1", "m2", "m3", "m4"):
        write(
            single_pretrain_cfg("v2xset", m, f"v2xset_single_{m}_pretrain"),
            f"{out_dir}/v2xset/single/{m}_pretrain.yaml",
        )
    for ref_name, method in E2E_METHODS.items():
        if method in ("max", "att"):
            continue  # hand-curated plain intermediate variants exist
        write(
            e2e_baseline_cfg(
                "v2xset", ["m1"], method, f"v2xset_lidar_{ref_name}"
            ),
            f"{out_dir}/v2xset/lidar_only/{ref_name}.yaml",
        )
    write(
        coalign_cfg("v2xset", ["m1"], "v2xset_lidar_coalign"),
        f"{out_dir}/v2xset/lidar_only/coalign.yaml",
    )
    write(
        pyramid_cfg("v2xset", ["m2"], "v2xset_camera_pyramid"),
        f"{out_dir}/v2xset/camera_only/pyramid.yaml",
    )
    write(
        coalign_cfg("v2xset", ["m2"], "v2xset_camera_coalign"),
        f"{out_dir}/v2xset/camera_only/coalign.yaml",
    )
    for m in ("m2", "m3", "m4"):
        cfg = base_cfg(
            f"v2xset_{m}_single_pyramid", "v2xset", "intermediateheter"
        )
        cfg["heter"] = heter_block(
            [m], ego=m, mapping={k: m for k in ("m1", "m2", "m3", "m4")}
        )
        cfg["heter"]["assignment_path"] = _assignment("v2xset")
        cfg["train_params"]["max_cav"] = 1
        cfg["model"] = heal_model([m], supervise_single=False, collab=False)
        cfg["loss"] = PYRAMID_LOSS
        if m == "m2":
            cfg["input_source"] = ["camera"]
        write(cfg, f"{out_dir}/v2xset/heal/stage2/{m}_single_pyramid.yaml")

    # ---- v2xsim breadth
    write(
        single_pretrain_cfg("v2xsim", "m1", "v2xsim_single_m1"),
        f"{out_dir}/v2xsim/single/m1.yaml",
    )
    for ref_name, method in (("attfuse", "att"), ("cobevt", "cobevt"),
                             ("disconet", "disconet")):
        cfg = base_cfg(
            f"v2xsim_point_pillar_{ref_name}", "v2xsim", "intermediate"
        )
        _dataset_paths(cfg, "v2xsim")
        cfg["model"] = pp_model(method)
        write(cfg, f"{out_dir}/v2xsim/lidar_only/{ref_name}.yaml")


def main(out_dir: str):
    # ---- opv2v homogeneous PointPillars family
    for method in (
        "max", "att", "disconet", "v2vnet", "v2xvit", "cobevt",
        "where2comm", "who2com", "when2com", "transformer",
    ):
        cfg = base_cfg(
            f"opv2v_point_pillar_{method}", "opv2v", "intermediate"
        )
        cfg["model"] = pp_model(method)
        write(cfg, f"{out_dir}/opv2v/lidar_only/{method}.yaml")

    for fusion, name in (("late", "late_fusion"), ("early", "early_fusion")):
        cfg = base_cfg(f"opv2v_point_pillar_{name}", "opv2v", fusion)
        cfg["model"] = pp_model()
        cfg["data_augment"] = [
            {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]},
            {"NAME": "random_world_rotation",
             "WORLD_ROT_ANGLE": [-0.78539816, 0.78539816]},
            {"NAME": "random_world_scaling",
             "WORLD_SCALE_RANGE": [0.95, 1.05]},
        ]
        write(cfg, f"{out_dir}/opv2v/lidar_only/{name}.yaml")

    cfg = base_cfg("opv2v_point_pillar_single", "opv2v", "late")
    cfg["model"] = pp_model()
    cfg["train_params"]["max_cav"] = 1
    write(cfg, f"{out_dir}/opv2v/single/point_pillar.yaml")

    # ---- HEAL protocol: stage 1, stage 2 x {m2, m3, m4}, final infer
    cfg = base_cfg("Pyramid_m1_base", "opv2v", "intermediateheter")
    cfg["heter"] = heter_block(
        ["m1"], mapping={"m1": "m1", "m2": "m1", "m3": "m1", "m4": "m1"}
    )
    cfg["model"] = heal_model(["m1"])
    cfg["loss"] = PYRAMID_LOSS
    write(cfg, f"{out_dir}/opv2v/heal/stage1/m1_pyramid.yaml")

    for m in ("m2", "m3", "m4"):
        cfg = base_cfg(f"Pyramid_{m}_alignto_m1", "opv2v", "intermediateheter")
        cfg["heter"] = heter_block(
            [m], ego=m, mapping={k: m for k in ("m1", "m2", "m3", "m4")}
        )
        cfg["train_params"]["max_cav"] = 1
        cfg["model"] = heal_model([m], supervise_single=False, collab=False)
        cfg["loss"] = PYRAMID_LOSS
        if m == "m2":
            cfg["input_source"] = ["camera"]
        write(cfg, f"{out_dir}/opv2v/heal/stage2/{m}_alignto_m1.yaml")

    cfg = base_cfg("Pyramid_m1m2m3m4_final", "opv2v", "intermediateheter")
    cfg["heter"] = heter_block(["m1", "m2", "m3", "m4"])
    cfg["model"] = heal_model(["m1", "m2", "m3", "m4"])
    cfg["loss"] = PYRAMID_LOSS
    cfg["input_source"] = ["lidar", "camera"]
    write(cfg, f"{out_dir}/opv2v/heal/final_infer/m1m2m3m4.yaml")

    # ---- end-to-end heterogeneous baselines (2 modality)
    for method in ("max", "att", "v2xvit"):
        cfg = base_cfg(
            f"opv2v_m1m2_{method}", "opv2v", "intermediateheter"
        )
        cfg["heter"] = heter_block(
            ["m1", "m2"],
            mapping={"m1": "m1", "m2": "m2", "m3": "m1", "m4": "m2"},
        )
        model = heal_model(["m1", "m2"])
        model["core_method"] = "heter_model_baseline"
        model["args"].pop("fusion_backbone")
        model["args"]["fusion_method"] = method
        model["args"]["shrink_header"]["input_dim"] = 64
        model["args"]["shrink_header"]["dim"] = [64]
        model["args"]["in_head"] = 64
        cfg["model"] = model
        cfg["input_source"] = ["lidar", "camera"]
        write(
            cfg, f"{out_dir}/opv2v/more_modality/m1m2_{method}.yaml"
        )

    # ---- camera-only
    cfg = base_cfg("opv2v_camera_m2", "opv2v", "intermediateheter")
    cfg["heter"] = heter_block(
        ["m2"], ego="m2", mapping={k: "m2" for k in ("m1", "m2", "m3", "m4")}
    )
    cfg["model"] = heal_model(["m2"])
    cfg["loss"] = PYRAMID_LOSS
    cfg["input_source"] = ["camera"]
    cfg["label_type"] = "camera"  # camera-visible GT (ref CameraOnly:16)
    write(cfg, f"{out_dir}/opv2v/camera_only/m2_pyramid.yaml")

    # ---- DAIR-V2X-C
    cfg = base_cfg("dairv2x_m1_pyramid", "dairv2x", "intermediateheter")
    cfg["root_dir"] = "dataset/dairv2x/train.json"
    cfg["validate_dir"] = "dataset/dairv2x/val.json"
    cfg["test_dir"] = "dataset/dairv2x/val.json"
    cfg["data_dir"] = "dataset/dairv2x"
    cfg["heter"] = heter_block(
        ["m1"], mapping={k: "m1" for k in ("m1", "m2", "m3", "m4")}
    )
    cfg["model"] = heal_model(["m1"])
    cfg["loss"] = PYRAMID_LOSS
    write(cfg, f"{out_dir}/dairv2x/m1_pyramid.yaml")

    cfg = base_cfg("dairv2x_second_coalign", "dairv2x", "intermediate")
    cfg["model"] = {
        "core_method": "second_intermediate",
        "args": {
            "voxel_size": [0.1, 0.1, 0.1],
            "lidar_range": CAV_RANGE,
            "second": {"channels": [16, 32, 64, 64],
                       "max_voxels": [32000, 24000, 16000, 12000]},
            "anchor_number": 2,
            "dir_args": DIR_ARGS,
            "fusion_method": "att",
            "att": {"feat_dim": 256},
            "base_bev_backbone": {
                "layer_nums": [3, 4],
                "layer_strides": [1, 2],
                "num_filters": [128, 256],
                "upsample_strides": [1, 2],
                "num_upsample_filter": [128, 128],
            },
            "shrink_header": {
                "kernal_size": [3], "stride": [1], "padding": [1],
                "dim": [256], "input_dim": 256,
            },
        },
    }
    cfg["box_align"] = {"args": {"landmark_thresh": 2.0, "iterations": 10}}
    write(cfg, f"{out_dir}/dairv2x/second_coalign.yaml")

    # ---- V2X-Sim
    cfg = base_cfg("v2xsim_point_pillar_fcooper", "v2xsim", "intermediate")
    cfg["root_dir"] = "dataset/v2xsim/train_infos.pkl"
    cfg["validate_dir"] = "dataset/v2xsim/val_infos.pkl"
    cfg["test_dir"] = "dataset/v2xsim/test_infos.pkl"
    cfg["model"] = pp_model("max")
    write(cfg, f"{out_dir}/v2xsim/point_pillar_fcooper.yaml")

    # ---- 3 / 4-modality end-to-end training
    for mods in (["m1", "m2", "m3"], ["m1", "m2", "m3", "m4"]):
        tag = "".join(mods)
        mapping = {
            k: (k if k in mods else mods[0])
            for k in ("m1", "m2", "m3", "m4")
        }
        cfg = base_cfg(
            f"opv2v_{tag}_pyramid", "opv2v", "intermediateheter"
        )
        cfg["heter"] = heter_block(mods, mapping=mapping)
        cfg["model"] = heal_model(mods)
        cfg["loss"] = PYRAMID_LOSS
        cfg["input_source"] = ["lidar", "camera"]
        write(cfg, f"{out_dir}/opv2v/more_modality/{tag}_pyramid.yaml")

        for method in ("att", "where2comm"):
            cfg = base_cfg(
                f"opv2v_{tag}_{method}", "opv2v", "intermediateheter"
            )
            cfg["heter"] = heter_block(mods, mapping=mapping)
            model = heal_model(mods)
            model["core_method"] = "heter_model_baseline"
            model["args"].pop("fusion_backbone")
            model["args"]["fusion_method"] = method
            if method == "where2comm":
                model["args"]["where2comm"] = {
                    "in_channels": 64, "threshold": 0.01,
                }
            model["args"]["shrink_header"]["input_dim"] = 64
            model["args"]["shrink_header"]["dim"] = [64]
            model["args"]["in_head"] = 64
            cfg["model"] = model
            cfg["input_source"] = ["lidar", "camera"]
            write(
                cfg,
                f"{out_dir}/opv2v/more_modality/{tag}_{method}.yaml",
            )

    # ---- multiscale heterogeneous baseline
    cfg = base_cfg("opv2v_m1m2_ms_max", "opv2v", "intermediateheter")
    cfg["heter"] = heter_block(
        ["m1", "m2"],
        mapping={"m1": "m1", "m2": "m2", "m3": "m1", "m4": "m2"},
    )
    model = heal_model(["m1", "m2"])
    model["core_method"] = "heter_model_baseline_ms"
    model["args"]["fusion_method"] = "max"
    model["args"]["fusion_backbone"] = {
        "layer_nums": [3, 5], "layer_strides": [1, 2],
        "num_filters": [64, 128], "upsample_strides": [1, 2],
        "num_upsample_filter": [128, 128],
    }
    model["args"]["shrink_header"]["input_dim"] = 256
    cfg["model"] = model
    cfg["input_source"] = ["lidar", "camera"]
    write(cfg, f"{out_dir}/opv2v/more_modality/m1m2_ms_max.yaml")

    # ---- late-heter (per-modality late fusion)
    cfg = base_cfg("opv2v_lateheter_m1m2", "opv2v", "lateheter")
    cfg["heter"] = heter_block(
        ["m1", "m2"],
        mapping={"m1": "m1", "m2": "m2", "m3": "m1", "m4": "m2"},
    )
    model = heal_model(["m1", "m2"])
    model["core_method"] = "heter_model_late"
    model["args"].pop("fusion_backbone")
    model["args"]["shrink_header"]["input_dim"] = 64
    model["args"]["shrink_header"]["dim"] = [64]
    model["args"]["in_head"] = 64
    cfg["model"] = model
    cfg["input_source"] = ["lidar", "camera"]
    write(cfg, f"{out_dir}/opv2v/more_modality/m1m2_lateheter.yaml")

    # ---- HEAL stage-1 bandwidth finetune (compressor)
    cfg = base_cfg("Pyramid_m1_compress", "opv2v", "intermediateheter")
    cfg["heter"] = heter_block(
        ["m1"], mapping={k: "m1" for k in ("m1", "m2", "m3", "m4")}
    )
    cfg["model"] = heal_model(["m1"])
    cfg["model"]["args"]["compressor"] = {
        "core_method": "naive", "input_dim": 64, "compress_ratio": 4,
    }
    cfg["loss"] = PYRAMID_LOSS
    write(cfg, f"{out_dir}/opv2v/heal/stage1/m1_pyramid_compress.yaml")

    # ---- CenterPoint family
    cfg = base_cfg(
        "opv2v_center_point_where2comm", "opv2v", "intermediate"
    )
    model = pp_model("where2comm")
    model["core_method"] = "center_point_where2comm"
    model["args"]["where2comm"] = {"threshold": 0.01}
    cfg["model"] = model
    cfg["loss"] = {
        "core_method": "center_point_loss",
        "args": {"cls_weight": 1.0, "reg_weight": 2.0},
    }
    write(cfg, f"{out_dir}/opv2v/lidar_only/center_point_where2comm.yaml")

    # ---- V2XSet family (same folder layout as OPV2V, no hdf5)
    for method in ("max", "att"):
        cfg = base_cfg(
            f"v2xset_point_pillar_{method}", "v2xset", "intermediate"
        )
        cfg["model"] = pp_model(method)
        write(cfg, f"{out_dir}/v2xset/lidar_only/{method}.yaml")

    cfg = base_cfg("v2xset_m1_pyramid", "v2xset", "intermediateheter")
    cfg["heter"] = heter_block(
        ["m1"], mapping={k: "m1" for k in ("m1", "m2", "m3", "m4")}
    )
    cfg["heter"]["assignment_path"] = (
        "modality_assign/v2xset_4modality.json"
    )
    cfg["model"] = heal_model(["m1"])
    cfg["loss"] = PYRAMID_LOSS
    write(cfg, f"{out_dir}/v2xset/heal/stage1/m1_pyramid.yaml")

    cfg = base_cfg("v2xset_m1m2m3m4_pyramid", "v2xset", "intermediateheter")
    cfg["heter"] = heter_block(["m1", "m2", "m3", "m4"])
    cfg["heter"]["assignment_path"] = (
        "modality_assign/v2xset_4modality.json"
    )
    cfg["model"] = heal_model(["m1", "m2", "m3", "m4"])
    cfg["loss"] = PYRAMID_LOSS
    cfg["input_source"] = ["lidar", "camera"]
    write(cfg, f"{out_dir}/v2xset/heal/final_infer/m1m2m3m4.yaml")

    emit_full_breadth(out_dir)
    emit_assignments(out_dir)
    print(f"config corpus written under {out_dir}")


def emit_assignments(out_dir: str, ref_root: str = "/root/reference"):
    """Ship modality_assign/*.json (ref modality_assign/: 4 maps).

    Skeleton (scenario names + cav ids — public dataset folder structure)
    comes from the reference dumps when available, else from any dataset
    tree the caller points at via generate_modality_assignment. The
    RANDOM assignment values are drawn with our own seeded RNG (the
    reference's values come from its own seed and are reproducible from
    its generator; drop its JSON into assignment_path for exact-match
    eval). The in-order variant is fully determined by the protocol rule
    (cav k -> m(k % 4 + 1), heter_utils.py:124-157).
    """
    import json

    import numpy as np

    dst = os.path.join(out_dir, "modality_assign")
    os.makedirs(dst, exist_ok=True)
    for dataset in ("opv2v", "v2xset"):
        for variant in ("", "_in_order"):
            src = os.path.join(
                ref_root,
                "opencood",
                "modality_assign",
                f"{dataset}_4modality{variant}.json",
            )
            if not os.path.exists(src):
                continue
            with open(src) as f:
                skeleton = json.load(f)
            rng = np.random.default_rng(303)
            out = {}
            for scen in sorted(skeleton):
                out[scen] = {}
                cavs = sorted(skeleton[scen], key=str)
                if variant:
                    # -1 (infrastructure) goes last, as in the reference
                    if cavs and cavs[0] == "-1":
                        cavs = cavs[1:] + cavs[:1]
                    for k, cav in enumerate(cavs):
                        out[scen][cav] = f"m{k % 4 + 1}"
                else:
                    perm = rng.permutation(4) + 1
                    for k, cav in enumerate(cavs):
                        out[scen][cav] = f"m{perm[k % 4]}"
            with open(
                os.path.join(dst, f"{dataset}_4modality{variant}.json"), "w"
            ) as f:
                json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.dirname(__file__) or ".")
    main(p.parse_args().out)
