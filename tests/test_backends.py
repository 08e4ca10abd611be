"""DAIR-V2X and V2X-Sim backends against synthetic miniature trees."""
import os

import numpy as np

from heal_tpu.config import load_yaml

CFG_DIR = os.path.join(os.path.dirname(__file__), "configs")


class TestDAIRV2X:
    def test_backend_and_pipeline(self, tmp_path):
        from heal_tpu.data import build_dataset
        from heal_tpu.data.dairv2x import (
            DAIRV2XBackend,
            write_synthetic_dair_tree,
        )

        root = str(tmp_path / "dair")
        split = write_synthetic_dair_tree(root, num_frames=2)
        params = {
            "root_dir": split,
            "data_dir": root,
            "fusion": {"dataset": "dairv2x"},
        }
        backend = DAIRV2XBackend(params, train=True)
        assert len(backend) == 2
        scene = backend.scene(0)
        assert len(scene["agents"]) == 2  # vehicle + infrastructure
        assert scene["objects"].shape == (4, 7)
        # infrastructure pose is where we placed it
        np.testing.assert_allclose(
            scene["agents"][1]["pose"][:2], [25.0, 5.0], atol=1e-6
        )

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_heter_collab.yaml"))
        cfg["root_dir"] = split
        cfg["data_dir"] = root
        cfg["fusion"]["dataset"] = "dairv2x"
        ds = build_dataset(cfg, train=True)
        sample = ds[0]
        assert sample["agent_mask"].sum() == 2
        assert sample["gt_mask"].sum() > 0


class TestV2XSim:
    def test_backend_and_pipeline(self, tmp_path):
        from heal_tpu.data import build_dataset
        from heal_tpu.data.v2xsim import (
            V2XSimBackend,
            write_synthetic_v2xsim_pickle,
        )

        root = str(tmp_path / "v2xsim")
        pkl = write_synthetic_v2xsim_pickle(root, num_frames=2, num_agents=3)
        params = {"root_dir": pkl, "fusion": {"dataset": "v2xsim"}}
        backend = V2XSimBackend(params, train=False)
        assert len(backend) == 2
        scene = backend.scene(0)
        assert len(scene["agents"]) == 3
        assert scene["objects"].shape == (5, 7)

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_heter_collab.yaml"))
        cfg["root_dir"] = pkl
        cfg["test_dir"] = pkl
        cfg["validate_dir"] = pkl
        cfg["fusion"]["dataset"] = "v2xsim"
        ds = build_dataset(cfg, train=False)
        sample = ds[0]
        assert sample["agent_mask"].sum() == 3
