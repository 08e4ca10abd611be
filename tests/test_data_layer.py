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


class TestCameraVisibleGT:
    """label_type 'camera': GT keeps only objects the ego's BEV
    visibility raster marks visible (ref opv2v_basedataset.py:55-56 ->
    base_postprocessor.generate_visible_object_center:485-560)."""

    def _scene(self):
        rng = np.random.default_rng(0)
        # object A at (10, 0) directly in front of the ego; object B at
        # (20, 0) hides exactly behind A; object C off to the side
        objects = np.array(
            [
                [10.0, 0.0, 0.75, 4.0, 1.8, 1.5, 0.0],
                [20.0, 0.0, 0.75, 4.0, 1.8, 1.5, 0.0],
                [5.0, -12.0, 0.75, 4.0, 1.8, 1.5, 0.0],
            ]
        )
        pose = [0.0, 0.0, 1.9, 0.0, 0.0, 0.0]
        pts = rng.uniform(-30, 30, (500, 4)).astype(np.float32)
        return objects, pose, pts

    def _assemble(self, label_type, with_map):
        from heal_tpu.data.scene import IntermediateAssembler
        from heal_tpu.data.synthetic import bev_visibility_map

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_intermediate.yaml"))
        cfg["label_type"] = label_type
        asm = IntermediateAssembler(cfg, train=True)
        objects, pose, pts = self._scene()
        agent = {"pose": pose, "modality": "m1", "points": pts}
        if with_map:
            agent["bev_visibility"] = bev_visibility_map(objects, pose)
        return asm.assemble({"agents": [agent], "objects": objects})

    def test_occluded_object_excluded_from_camera_labels(self):
        lidar = self._assemble("lidar", with_map=True)
        camera = self._assemble("camera", with_map=True)
        assert lidar["gt_mask"].sum() == 3
        assert camera["gt_mask"].sum() == 2
        xs = camera["gt_boxes"][camera["gt_mask"] > 0][:, 0]
        assert 10.0 in np.round(xs, 3)   # front object visible
        assert 20.0 not in np.round(xs, 3)  # occluded object dropped

    def test_missing_map_falls_back_to_range_gt(self):
        # real trees without bev_visibility.png must still train
        camera = self._assemble("camera", with_map=False)
        assert camera["gt_mask"].sum() == 3

    def test_synthetic_backend_emits_maps_for_camera_labels(self):
        from heal_tpu.data.synthetic import SyntheticDataset

        ds = SyntheticDataset(
            {"label_type": "camera"}, train=True, num_scenes=1,
            num_agents=2, num_vehicles=5,
        )
        scene = ds.scene(0)
        for agent in scene["agents"]:
            vm = agent["bev_visibility"]
            assert vm.shape == (256, 256) and vm.dtype == np.uint8
            assert vm.max() > 0

    def test_camera_visible_mask_convention(self):
        """box_is_visible rasterization parity: py = 127 - x/0.39,
        px = 127 + y/0.39 (ref box_utils.py:1256-1266)."""
        from heal_tpu.utils.box_np import camera_visible_mask

        vm = np.zeros((256, 256), np.uint8)
        vm[127 - int(10 / 0.39), 127 + int(4 / 0.39)] = 1
        boxes = np.array([[10.0, 4.0], [10.0, -4.0], [999.0, 0.0]])
        np.testing.assert_array_equal(
            camera_visible_mask(boxes, vm), [True, False, False]
        )


class TestPrefetchPipeline:
    def test_prefetch_preserves_order_and_transform(self):
        from heal_tpu.data.prefetch import prefetch

        got = list(prefetch(iter(range(7)), transform=lambda x: x * 10,
                            depth=3))
        assert got == [0, 10, 20, 30, 40, 50, 60]

    def test_prefetch_propagates_worker_errors(self):
        from heal_tpu.data.prefetch import prefetch

        def bad():
            yield 1
            raise ValueError("boom")

        it = prefetch(bad())
        assert next(it) == 1
        with pytest.raises(ValueError, match="boom"):
            list(it)

    def test_process_shard_single_host_is_identity(self):
        from heal_tpu.data.prefetch import process_shard

        assert process_shard(10) == (0, 10)

    def test_process_shard_multi_host_disjoint_equal(self, monkeypatch):
        import jax

        from heal_tpu.data.prefetch import process_shard

        monkeypatch.setattr(jax, "process_count", lambda: 4)
        shards = []
        for rank in range(4):
            monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
            shards.append(process_shard(11))
        # equal-length, disjoint, remainder dropped
        assert shards == [(0, 2), (2, 4), (4, 6), (6, 8)]

    def test_train_batches_split_by_process(self, monkeypatch):
        import jax

        from heal_tpu.data import build_dataset

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_intermediate.yaml"))
        ds = build_dataset(cfg, train=True)
        full = [b["gt_boxes"][0, 0] for b in ds.batches(1, shuffle=False)]
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        seen = []
        for rank in range(2):
            monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
            seen.append(
                [b["gt_boxes"][0, 0] for b in ds.batches(1, shuffle=False)]
            )
        assert len(seen[0]) == len(seen[1]) == len(full) // 2
        np.testing.assert_array_equal(
            np.concatenate([np.stack(s) for s in seen]), np.stack(full)
        )
