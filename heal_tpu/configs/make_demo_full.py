"""Emit the FLAGSHIP-scale HEAL protocol demo configs (demo_heal_full/).

Scales the mid-scale demo_heal/ pipeline to +-51.2 m with the flagship
per-modality resolutions (0.4 m pillars -> 256x256 BEV, 0.1 m SECOND
voxels whose 8x grid lands exactly on the 0.8 m fusion canvas, LSS at
0.8 m / 24 LID depth bins) and extends it to FOUR agent types: the
reference's full open-heterogeneity protocol (yifanlu0227/HEAL
hypes_yaml/opv2v/HEAL: stage1 -> per-modality stage2 -> merge ->
inference_heter_in_order), run end-to-end by tools/run_demo_full.

m1: 64-line lidar, PointPillars 0.4 m
m2: 4-camera rig, Lift-Splat-Shoot
m3: 64-line lidar, SECOND sparse conv 0.1 m
m4: 16-line lidar, PointPillars 0.4 m (lidar_channels_dict)

Usage: python -m heal_tpu.configs.make_demo_full [--out DIR]
"""
from __future__ import annotations

import argparse
import copy
import os

import yaml

HERE = os.path.dirname(__file__)
R51 = [-51.2, -51.2, -3, 51.2, 51.2, 1]
R38 = [-38.4, -38.4, -3, 38.4, 38.4, 1]


def _rescale(node):
    """Recursively rewrite the +-38.4 demo geometry to +-51.2 flagship."""
    if isinstance(node, list):
        if node == R38:
            return list(R51)
        if node == [0.6, 0.6, 4]:
            return [0.4, 0.4, 4]
        if node == [0.15, 0.15, 0.2]:
            return [0.1, 0.1, 0.1]
        if node == [-38.4, 38.4, 1.2]:  # LSS x/ybound
            return [-51.2, 51.2, 0.8]
        if node == [2, 30, 16]:  # ddiscr: see 50 m at flagship range
            return [2, 50, 24]
        if node == [128, 192]:  # camera final_dim
            return [192, 256]
        if node == [16000, 12000, 8000, 6000]:  # SECOND column caps
            return [24000, 18000, 12000, 9000]
        return [_rescale(v) for v in node]
    if isinstance(node, dict):
        out = {k: _rescale(v) for k, v in node.items()}
        if "vw" in out and out.get("vw") == 0.6:
            out["vw"] = out["vh"] = 0.4
            out["W"] = out["H"] = 256
        if out.get("max_points") == 15000:
            out["max_points"] = 25000
        if out.get("max_points_per_voxel") == 5:
            # 0.1 m voxels hold fewer points than 0.15 m ones; keep 5
            pass
        # raw synthetic camera canvas follows final_dim
        if out.get("H") == 150 and out.get("W") == 200:
            out["H"], out["W"] = 300, 400
        return out
    return node


def _load(name):
    with open(os.path.join(HERE, "demo_heal", f"{name}.yaml")) as f:
        return yaml.safe_load(f)


def _write(cfg, out_dir, name):
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"{name}.yaml"), "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)


def make_m4_stage2(stage1):
    """Derive the 16-line-pillars stage-2 config from the stage-1 m1
    blocks: same encoder geometry, res3x3 aligner, single-agent training
    against the frozen base (ref m4 = PointPillars on sparse lidar,
    hypes_yaml/opv2v/HEAL/stage2)."""
    cfg = copy.deepcopy(stage1)
    cfg["name"] = "heal_demo_full_m4_single"
    cfg["train_params"]["max_cav"] = 1
    cfg["train_params"]["epoches"] = 12
    cfg["heter"] = {
        "ego_modality": "m4",
        "mapping_dict": {m: "m4" for m in ("m1", "m2", "m3", "m4")},
        "lidar_channels_dict": {"m4": 16},
        "modality_setting": {
            "m4": copy.deepcopy(
                stage1["heter"]["modality_setting"]["m1"]
            )
        },
    }
    cfg["fusion"]["args"]["num_agents"] = 1
    ma = cfg["model"]["args"]
    m4 = copy.deepcopy(ma.pop("m1"))
    m4["aligner_args"] = {
        "core_method": "res3x3",
        "args": {"num_of_blocks": 2},
    }
    ma["m4"] = m4
    ma["supervise_single"] = False
    cfg["model"]["core_method"] = "heter_pyramid_single"
    return cfg


def main(out_dir=None):
    out_dir = out_dir or os.path.join(HERE, "demo_heal_full")

    stage1 = _rescale(_load("stage1_m1"))
    stage1["name"] = "heal_demo_full_m1_base"
    stage1["train_params"]["max_cav"] = 4
    stage1["train_params"]["batch_size"] = 2
    stage1["fusion"]["args"].update(
        num_agents=4, num_vehicles=14,
        # 384 cached batches of 4-agent 256x256 targets fit HBM next to
        # the train step; 512 would not
        num_scenes_train=384, num_scenes_test=48,
    )
    _write(stage1, out_dir, "stage1_m1")

    m2 = _rescale(_load("stage2_m2"))
    m2["name"] = "heal_demo_full_m2_single"
    m2["fusion"]["args"].update(
        num_vehicles=14, num_scenes_train=384, num_scenes_test=48
    )
    m2["train_params"]["batch_size"] = 2
    _write(m2, out_dir, "stage2_m2")

    m3 = _rescale(_load("stage2_m3"))
    m3["name"] = "heal_demo_full_m3_single"
    m3["fusion"]["args"].update(
        num_vehicles=14, num_scenes_train=384, num_scenes_test=48
    )
    m3["train_params"]["batch_size"] = 2
    _write(m3, out_dir, "stage2_m3")

    m4 = make_m4_stage2(stage1)
    m4["fusion"]["args"]["num_vehicles"] = 14
    _write(m4, out_dir, "stage2_m4")

    # merged-alliance inference config: all four branches, identity
    # mapping, agents cycle modalities (synthetic backend round-robin)
    final = _rescale(_load("final_m1m2m3"))
    final["name"] = "heal_demo_full_final_m1m2m3m4"
    final["train_params"]["max_cav"] = 4
    final["heter"]["mapping_dict"] = {
        m: m for m in ("m1", "m2", "m3", "m4")
    }
    final["heter"]["lidar_channels_dict"] = {"m4": 16}
    final["heter"]["modality_setting"]["m4"] = copy.deepcopy(
        stage1["heter"]["modality_setting"]["m1"]
    )
    final["fusion"]["args"].update(
        num_agents=4, num_vehicles=14,
        num_scenes_train=384, num_scenes_test=48,
    )
    fm = final["model"]["args"]
    fm["m4"] = copy.deepcopy(m4["model"]["args"]["m4"])
    _write(final, out_dir, "final_m1m2m3m4")
    print(f"[make_demo_full] wrote 5 configs to {out_dir}")


RB = [-102.4, -51.2, -3, 102.4, 51.2, 1]  # the bench/in-order range
# (ref tools/inference_heter_in_order.py:48-49: 204.8 m x 102.4 m)


def _bench_rescale(node, key=None):
    """demo_heal_full (+-51.2 square) -> bench scale (204.8 x 102.4,
    x-asymmetric). Key-aware: xbound/W stretch 2x along x, ybound/H
    unchanged."""
    if isinstance(node, list):
        if node == R51:
            return list(RB)
        if key == "xbound" and node == [-51.2, 51.2, 0.8]:
            return [-102.4, 102.4, 0.8]
        if key == "ddiscr" and node == [2, 50, 24]:
            return [2, 80, 32]  # cameras see 80 m at bench range
        return [_bench_rescale(v) for v in node]
    if isinstance(node, dict):
        out = {k: _bench_rescale(v, k) for k, v in node.items()}
        # anchor grid: W counts x cells (102.4 -> 204.8 at vw 0.4)
        if out.get("vw") == 0.4 and out.get("W") == 256:
            out["W"] = 512
        if out.get("max_points") == 25000:
            out["max_points"] = 30000
        return out
    return node


def main_bench(out_dir=None):
    """Bench-scale protocol demo (VERDICT r4 item 5): stage-1 m1 +
    stage-2 m2 camera + merged m1m2 alliance at the 204.8 x 102.4 m
    in-order eval range. Derived from the +-51.2 demo_heal_full configs
    by the key-aware x-stretch above."""
    out_dir = out_dir or os.path.join(HERE, "demo_heal_bench")
    full = os.path.join(HERE, "demo_heal_full")
    if not os.path.isdir(full):
        main()

    def _loadf(name):
        with open(os.path.join(full, f"{name}.yaml")) as f:
            return yaml.safe_load(f)

    stage1 = _bench_rescale(_loadf("stage1_m1"))
    stage1["name"] = "heal_demo_bench_m1_base"
    stage1["fusion"]["args"].update(num_vehicles=20)
    _write(stage1, out_dir, "stage1_m1")

    m2 = _bench_rescale(_loadf("stage2_m2"))
    m2["name"] = "heal_demo_bench_m2_single"
    m2["fusion"]["args"].update(num_vehicles=20)
    _write(m2, out_dir, "stage2_m2")

    # merged alliance with TWO trained types; m3/m4-assigned agents run
    # the closest trained branch so the in-order k=1..4 protocol still
    # adds one agent per step (types alternate m1/m2)
    final = _bench_rescale(_loadf("final_m1m2m3m4"))
    final["name"] = "heal_demo_bench_final_m1m2"
    final["heter"]["mapping_dict"] = {
        "m1": "m1", "m2": "m2", "m3": "m1", "m4": "m2"
    }
    final["heter"].pop("lidar_channels_dict", None)
    for drop in ("m3", "m4"):
        final["heter"]["modality_setting"].pop(drop, None)
        final["model"]["args"].pop(drop, None)
    final["fusion"]["args"].update(num_vehicles=20)
    _write(final, out_dir, "final_m1m2")
    print(f"[make_demo_full --bench] wrote 3 configs to {out_dir}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--bench", action="store_true")
    a = p.parse_args()
    if a.bench:
        main_bench(a.out)
    else:
        main(a.out)
