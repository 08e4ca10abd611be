"""OPV2V / OPV2V-H / V2XSet folder-layout backend.

Reference: data_utils/datasets/basedataset/opv2v_basedataset.py — scan
``root/scenario/cav_id/timestamp.{yaml,pcd}`` trees, parse per-frame
metadata (lidar pose, vehicle boxes, camera calib), apply the
heterogeneous Adaptor (utils/heter_utils.py): ego-first ordering,
modality assignment via assignment JSON + mapping_dict, 16/32-line lidar
file switching.

Yields scenes in the assembler contract: agents [{pose, modality, points,
(cameras)}] + world-frame objects.
"""
from __future__ import annotations

import json
import os

import numpy as np
import yaml

from ..utils.common import limit_period


def load_pcd(path: str) -> np.ndarray:
    """Minimal PCD reader (ascii + binary, x y z intensity).

    The C++ fast path (heal_tpu.native.read_pcd) is preferred when built;
    this numpy version is the fallback and the reference for tests.
    """
    from .. import native

    if native.available():
        return native.read_pcd(path)
    return _load_pcd_numpy(path)


def _load_pcd_numpy(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", errors="ignore").strip()
            if line.startswith("#") or not line:
                continue
            key, _, value = line.partition(" ")
            header[key] = value
            if key == "DATA":
                break
        fields = header.get("FIELDS", "x y z intensity").split()
        sizes = [int(s) for s in header.get("SIZE", "4 4 4 4").split()]
        count = int(header.get("POINTS", 0))
        if header["DATA"] == "ascii":
            data = np.loadtxt(f, dtype=np.float32, max_rows=count)
            data = np.atleast_2d(data)
        else:
            dtype = np.dtype(
                {
                    "names": fields,
                    "formats": [f"<f{s}" for s in sizes],
                }
            )
            raw = np.frombuffer(f.read(dtype.itemsize * count), dtype=dtype)
            data = np.stack(
                [raw[name].astype(np.float32) for name in fields], axis=1
            )
    cols = {name: i for i, name in enumerate(fields)}
    xyz = data[:, [cols["x"], cols["y"], cols["z"]]]
    inten = (
        data[:, cols["intensity"]][:, None]
        if "intensity" in cols
        else np.ones((len(data), 1), np.float32)
    )
    return np.concatenate([xyz, inten], axis=1).astype(np.float32)


def _load_frame_yaml(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def objects_from_yaml(frame: dict) -> np.ndarray:
    """vehicles dict -> (K, 7) world lwh boxes.

    OPV2V convention: box center = location + center offset, dims =
    2*extent (half-extents x=l/2, y=w/2, z=h/2), yaw = angle[1] degrees.
    """
    vehicles = frame.get("vehicles", {}) or {}
    out = []
    for _vid, v in vehicles.items():
        loc = np.asarray(v["location"], dtype=np.float64)
        center = np.asarray(v.get("center", [0, 0, 0]), dtype=np.float64)
        ext = np.asarray(v["extent"], dtype=np.float64)
        yaw = np.radians(v["angle"][1])
        out.append(
            [
                *(loc + center),
                2 * ext[0],
                2 * ext[1],
                2 * ext[2],
                limit_period(yaw),
            ]
        )
    return np.asarray(out, dtype=np.float64).reshape(-1, 7)


class Adaptor:
    """Heterogeneous agent-type logic (ref utils/heter_utils.py:32-93):
    fixed per-(scenario, cav) modality from the assignment JSON, eval-time
    mapping_dict remap, ego-first reordering so slot 0 has an
    ego-capable modality, modality filter."""

    def __init__(self, heter_cfg: dict | None, train: bool):
        self.enabled = heter_cfg is not None
        if not self.enabled:
            return
        self.ego_modality = heter_cfg.get("ego_modality", "m1")
        self.mapping = heter_cfg.get("mapping_dict", {})
        self.modalities = sorted(heter_cfg["modality_setting"].keys())
        self.train = train
        path = heter_cfg.get("assignment_path")
        self.assignment = {}
        if path and os.path.exists(path):
            with open(path) as f:
                self.assignment = json.load(f)

    def modality_of(self, scenario: str, cav_id: str, rng) -> str:
        if not self.enabled:
            return "m1"
        m = self.assignment.get(scenario, {}).get(str(cav_id))
        if m is None:
            m = self.modalities[rng.integers(0, len(self.modalities))]
        return self.mapping.get(m, m)

    def reorder_ego_first(self, cav_ids: list, modalities: dict) -> list:
        """Put an ego-capable agent first (ref heter_utils.py:32-60)."""
        if not self.enabled:
            return cav_ids
        ego_ok = [
            c for c in cav_ids if modalities[c] in self.ego_modality
        ]
        rest = [c for c in cav_ids if modalities[c] not in self.ego_modality]
        return ego_ok + rest


class OPV2VBackend:
    def __init__(self, params: dict, train: bool = True):
        self.params = params
        self.train = train
        key = "root_dir" if train else "test_dir"
        self.root = params[key]
        self.heter = params.get("heter")
        self.adaptor = Adaptor(self.heter, train)
        self.lidar_channels = (self.heter or {}).get(
            "lidar_channels_dict", {}
        )
        self.reinitialize()

    def reinitialize(self, seed: int = 0):
        """(Re)scan scenario folders and build the frame index
        (ref opv2v_basedataset.reinitialize:82)."""
        rng = np.random.default_rng(seed)
        self.frames = []  # list of (scenario, [cav_ids], timestamp)
        scenarios = sorted(
            d
            for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
        )
        for scen in scenarios:
            sdir = os.path.join(self.root, scen)
            cavs = sorted(
                d
                for d in os.listdir(sdir)
                if os.path.isdir(os.path.join(sdir, d)) and not d.startswith("_")
            )
            if not cavs:
                continue
            modalities = {
                c: self.adaptor.modality_of(scen, c, rng) for c in cavs
            }
            cavs = self.adaptor.reorder_ego_first(cavs, modalities)
            timestamps = sorted(
                f[:-5]
                for f in os.listdir(os.path.join(sdir, cavs[0]))
                if f.endswith(".yaml") and "camera" not in f
            )
            for ts in timestamps:
                self.frames.append((scen, cavs, modalities, ts))

    def __len__(self):
        return len(self.frames)

    def scene(self, idx: int) -> dict:
        scen, cavs, modalities, ts = self.frames[idx]
        agents = []
        objects_all = {}
        for cav in cavs:
            cdir = os.path.join(self.root, scen, cav)
            frame = _load_frame_yaml(os.path.join(cdir, f"{ts}.yaml"))
            modality = modalities[cav]
            # 16/32-line lidar swap (ref heter_utils.py:85-93)
            channels = self.lidar_channels.get(modality, 64)
            pcd_name = (
                f"{ts}.pcd" if channels >= 64 else f"{ts}_{channels}.pcd"
            )
            pcd_path = os.path.join(cdir, pcd_name)
            if not os.path.exists(pcd_path):
                pcd_path = os.path.join(cdir, f"{ts}.pcd")
            points = load_pcd(pcd_path)
            agent = {
                "pose": list(frame["lidar_pose"]),
                "modality": modality,
                "points": points,
            }
            if "camera0" in frame:
                agent["camera_meta"] = {
                    k: frame[k] for k in frame if k.startswith("camera")
                }
                agent["camera_dir"] = cdir
                agent["timestamp"] = ts
            agents.append(agent)
            # union of vehicle boxes over agents' metadata (world frame)
            for vid, v in (frame.get("vehicles", {}) or {}).items():
                objects_all[vid] = v
        objects = objects_from_yaml({"vehicles": objects_all})
        return {"agents": agents, "objects": objects}


def write_synthetic_opv2v_tree(
    root: str,
    num_scenarios: int = 1,
    num_cavs: int = 2,
    num_timestamps: int = 2,
    num_vehicles: int = 5,
    seed: int = 0,
):
    """Write a tiny OPV2V-layout tree (yaml + ascii pcd) for tests/CI
    (stands in for the real recordings)."""
    from .synthetic import simulate_lidar

    rng = np.random.default_rng(seed)
    for s in range(num_scenarios):
        scen = os.path.join(root, f"2021_synth_{s:02d}")
        vehicles = {}
        for k in range(num_vehicles):
            vehicles[1000 + k] = {
                "location": [
                    float(rng.uniform(-40, 40)),
                    float(rng.uniform(-20, 20)),
                    0.0,
                ],
                "center": [0.0, 0.0, 0.75],
                "extent": [2.2, 0.9, 0.75],
                "angle": [0.0, float(rng.uniform(-180, 180)), 0.0],
            }
        world_objs = objects_from_yaml({"vehicles": vehicles})
        for c in range(num_cavs):
            cav_dir = os.path.join(scen, str(200 + c))
            os.makedirs(cav_dir, exist_ok=True)
            pose = [
                float(rng.uniform(-15, 15)) if c else 0.0,
                float(rng.uniform(-8, 8)) if c else 0.0,
                1.9,
                0.0,
                float(rng.uniform(-90, 90)) if c else 0.0,
                0.0,
            ]
            for t in range(num_timestamps):
                ts = f"{t:06d}"
                frame = {
                    "lidar_pose": pose,
                    "true_ego_pos": pose,
                    "vehicles": vehicles,
                }
                with open(os.path.join(cav_dir, f"{ts}.yaml"), "w") as f:
                    yaml.safe_dump(frame, f)
                pts = simulate_lidar(world_objs, pose, rng, ground_points=500)
                with open(os.path.join(cav_dir, f"{ts}.pcd"), "w") as f:
                    f.write(
                        "VERSION .7\nFIELDS x y z intensity\n"
                        "SIZE 4 4 4 4\nTYPE F F F F\nCOUNT 1 1 1 1\n"
                        f"WIDTH {len(pts)}\nHEIGHT 1\n"
                        "VIEWPOINT 0 0 0 1 0 0 0\n"
                        f"POINTS {len(pts)}\nDATA ascii\n"
                    )
                    np.savetxt(f, pts, fmt="%.4f")
