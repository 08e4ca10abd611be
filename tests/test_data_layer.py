import os

import numpy as np
import pytest

from heal_tpu.config import load_yaml

CFG_DIR = os.path.join(os.path.dirname(__file__), "configs")


class TestOPV2VBackend:
    def test_synthetic_tree_roundtrip(self, tmp_path):
        from heal_tpu.data.opv2v import (
            OPV2VBackend,
            load_pcd,
            write_synthetic_opv2v_tree,
        )

        root = str(tmp_path / "opv2v" / "train")
        write_synthetic_opv2v_tree(root, num_scenarios=1, num_cavs=2,
                                   num_timestamps=2)
        params = {"root_dir": root, "fusion": {"dataset": "opv2v"}}
        backend = OPV2VBackend(params, train=True)
        assert len(backend) == 2
        scene = backend.scene(0)
        assert len(scene["agents"]) == 2
        assert scene["objects"].shape[1] == 7
        pts = scene["agents"][0]["points"]
        assert pts.shape[1] == 4 and len(pts) > 100
        # ego is agent 0 with pose at origin
        np.testing.assert_allclose(scene["agents"][0]["pose"][:2], [0, 0])

    def test_full_pipeline_from_disk(self, tmp_path):
        from heal_tpu.data import build_dataset
        from heal_tpu.data.opv2v import write_synthetic_opv2v_tree

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_heter_collab.yaml"))
        root = str(tmp_path / "opv2v" / "train")
        write_synthetic_opv2v_tree(root, num_scenarios=1, num_cavs=2,
                                   num_timestamps=3)
        cfg["root_dir"] = root
        cfg["test_dir"] = root
        cfg["fusion"]["dataset"] = "opv2v"
        ds = build_dataset(cfg, train=True)
        assert len(ds) == 3
        sample = ds[0]
        assert sample["agent_mask"].sum() == 2
        assert sample["gt_mask"].sum() > 0
        batch = next(ds.batches(2))
        assert batch["points"].shape[0] == 2


class TestLateEarly:
    def _cfg(self, method):
        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_intermediate.yaml"))
        cfg["fusion"]["core_method"] = method
        return cfg

    def test_late_train_sample(self):
        from heal_tpu.data import build_dataset

        ds = build_dataset(self._cfg("late"), train=True)
        s = ds[0]
        assert s["points"].shape == (6000, 4)
        assert s["transformation_matrix"].shape == (4, 4)

    def test_late_test_has_agent_samples(self):
        from heal_tpu.data import build_dataset

        ds = build_dataset(self._cfg("late"), train=False)
        s = ds[0]
        assert "agent_samples" in s
        for sub in s["agent_samples"]:
            assert sub["transformation_matrix"].shape == (4, 4)

    def test_early_merges_points(self):
        from heal_tpu.data import build_dataset

        ds_early = build_dataset(self._cfg("early"), train=True)
        ds_late = build_dataset(self._cfg("late"), train=False)
        se = ds_early[0]
        sl = ds_late[0]
        # early fusion sees at least as many points as the ego alone
        assert se["point_mask"].sum() >= sl["point_mask"].sum()


class TestCheckpointMerge:
    def test_loose_update_and_merge(self, tmp_path):
        import numpy as np

        from heal_tpu.tools import checkpoint as ck

        base = {
            "params": {
                "pyramid_backbone": {"w": np.ones(3)},
                "heads": {"w": np.full(2, 2.0)},
                "branch_m1": {"w": np.full(4, 3.0)},
            }
        }
        m2 = {
            "params": {
                "pyramid_backbone": {"w": np.full(3, 9.0)},  # must NOT win
                "branch_m2": {"w": np.full(5, 4.0)},
            }
        }
        p_m2 = ck.save_checkpoint(str(tmp_path / "m2"), m2, 4, bestval=True)
        p_base = ck.save_checkpoint(str(tmp_path / "base"), base, 7)
        merged = ck.merge_checkpoints(
            [p_m2, p_base], drop_prefixes=("pyramid_backbone", "heads")
        )
        np.testing.assert_allclose(
            merged["params"]["pyramid_backbone"]["w"], 1.0
        )
        np.testing.assert_allclose(merged["params"]["branch_m2"]["w"], 4.0)
        np.testing.assert_allclose(merged["params"]["branch_m1"]["w"], 3.0)

    def test_find_checkpoint_prefers_bestval(self, tmp_path):
        from heal_tpu.tools import checkpoint as ck

        d = str(tmp_path)
        ck.save_checkpoint(d, {"params": {}}, 10)
        ck.save_checkpoint(d, {"params": {}}, 4, bestval=True)
        epoch, path = ck.find_checkpoint(d)
        assert epoch == 4 and "bestval" in path

    def test_loose_update_reports_missing(self):
        import numpy as np

        from heal_tpu.tools.checkpoint import loose_update

        target = {"a": {"w": np.zeros(2)}}
        missing = loose_update(
            target, {"a": {"w": np.ones(2)}, "b": {"w": np.ones(1)}},
            verbose=False,
        )
        np.testing.assert_allclose(target["a"]["w"], 1.0)
        assert missing == ["/b"]


class TestModalityCapacity:
    """heter.modality_setting.mX.max_agents bounds the packed capacity."""

    def test_capped_packing_drops_excess_and_masks(self):
        import numpy as np
        from heal_tpu.config import load_yaml
        from heal_tpu.data import build_dataset

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_heter_collab.yaml"))
        cfg["train_params"]["max_cav"] = 3
        cfg["fusion"]["args"]["num_agents"] = 3
        # every agent is m1 (mapping collapses); cap m1 at 2
        for m, setting in cfg["heter"]["modality_setting"].items():
            setting["max_agents"] = 2
        ds = build_dataset(cfg, train=False)
        batch = next(ds.batches(1, shuffle=False))
        for m in cfg["heter"]["modality_setting"]:
            assert batch[f"slots_{m}"].shape[1] == 2
            lead = batch[f"inputs_{m}"]
            lead = lead["points"] if "points" in lead else next(
                iter(lead.values()))
            assert lead.shape[1] == 2
        # the third m1 agent left the collaboration entirely — and the
        # eviction is counted, never silent
        assert batch["agent_mask"].sum() <= 2
        assert int(batch["dropped_agent_count"].sum()) >= 1

    def test_no_drop_reports_zero(self):
        from heal_tpu.config import load_yaml
        from heal_tpu.data import build_dataset

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_heter_collab.yaml"))
        ds = build_dataset(cfg, train=False)
        batch = next(ds.batches(1, shuffle=False))
        assert int(batch["dropped_agent_count"].sum()) == 0

    def test_default_capacity_unchanged(self):
        from heal_tpu.config import load_yaml
        from heal_tpu.data import build_dataset

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_heter_collab.yaml"))
        L = cfg["train_params"]["max_cav"]
        ds = build_dataset(cfg, train=False)
        batch = next(ds.batches(1, shuffle=False))
        for m in cfg["heter"]["modality_setting"]:
            assert batch[f"slots_{m}"].shape[1] == L


class TestPoseNoise:
    """Pose-noise distributions (ref utils/pose_utils.py:9-140)."""

    def test_von_mises_statistics(self):
        from heal_tpu.utils.pose_noise import generate_noise_von_mises

        np.random.seed(0)
        deltas = np.stack(
            [generate_noise_von_mises(0.5, 10.0) for _ in range(4000)]
        )
        # only x, y, yaw perturbed
        assert np.all(deltas[:, [2, 3, 5]] == 0)
        assert abs(deltas[:, 0].std() - 0.5) < 0.05
        # kappa = (180/(pi*rot_std))^2 makes the circular std ~rot_std deg
        yaw = deltas[:, 4]
        assert abs(yaw.mean()) < 1.0
        assert abs(yaw.std() - 10.0) < 1.0
        # samples stay on the circle
        assert np.all(np.abs(yaw) <= 180.0)

    def test_add_pose_noise_dispatch(self):
        from heal_tpu.utils.pose_noise import add_pose_noise

        poses = [np.zeros(6), np.ones(6)]
        np.random.seed(1)
        out = add_pose_noise(
            poses, {"pos_std": 0.2, "rot_std": 0.2, "von_mises": True}
        )
        assert len(out) == 2
        delta = out[1] - np.ones(6)
        assert np.any(delta[:2] != 0) and delta[2] == 0
