"""CoAlign pose refinement: noisy poses recovered from shared boxes."""
import numpy as np

from heal_tpu.utils.box_align import box_alignment_relative, cluster_boxes


def make_world(rng, n_agents=3, n_obj=8):
    objects = np.stack(
        [rng.uniform(-40, 40, n_obj), rng.uniform(-20, 20, n_obj)], axis=1
    )
    poses = np.zeros((n_agents, 6))
    poses[1:, 0] = rng.uniform(-15, 15, n_agents - 1)
    poses[1:, 1] = rng.uniform(-8, 8, n_agents - 1)
    poses[1:, 4] = rng.uniform(-60, 60, n_agents - 1)

    def to_agent(pose, pts):
        yaw = np.radians(pose[4])
        c, s = np.cos(yaw), np.sin(yaw)
        rot = np.array([[c, -s], [s, c]])
        return (pts - pose[:2]) @ rot  # world -> agent (R^T)

    centers = [to_agent(p, objects) for p in poses]
    return objects, poses, centers


class TestClustering:
    def test_common_objects_cluster(self):
        rng = np.random.default_rng(0)
        objects, poses, centers = make_world(rng)
        world = [objects + rng.normal(0, 0.05, objects.shape) for _ in range(3)]
        clusters = cluster_boxes(world)
        assert len(clusters) == len(objects)
        assert all(len(c) == 3 for c in clusters)


class TestAlignment:
    def test_refines_noisy_poses(self):
        rng = np.random.default_rng(1)
        objects, poses, centers = make_world(rng)
        noisy = poses.copy()
        noisy[1:, 0] += rng.normal(0, 0.8, 2)
        noisy[1:, 1] += rng.normal(0, 0.8, 2)
        noisy[1:, 4] += rng.normal(0, 3.0, 2)

        refined = box_alignment_relative(centers, noisy)
        err_before = np.abs(noisy[1:, [0, 1, 4]] - poses[1:, [0, 1, 4]])
        err_after = np.abs(refined[1:, [0, 1, 4]] - poses[1:, [0, 1, 4]])
        assert err_after.max() < 0.1, (err_before, err_after)
        # ego untouched
        np.testing.assert_allclose(refined[0], poses[0])

    def test_no_overlap_keeps_poses(self):
        rng = np.random.default_rng(2)
        # agents see disjoint objects: nothing to align on
        centers = [
            rng.uniform(-10, 10, (3, 2)),
            rng.uniform(100, 120, (3, 2)),
        ]
        poses = np.zeros((2, 6))
        poses[1, 0] = 5.0
        refined = box_alignment_relative(centers, poses)
        np.testing.assert_allclose(refined, poses, atol=1e-9)


class TestCoAlignLoop:
    """Precalc-json injection -> box-align in the dataloader ->
    pose_graph_evaluate reporting (ref tools/pose_graph_evaluate.py)."""

    def _setup(self, tmp_path):
        import json
        import os

        import yaml

        from heal_tpu.config import load_yaml
        from heal_tpu.data import build_dataset

        cfg_path = os.path.join(
            os.path.dirname(__file__), "configs", "tiny_heter_collab.yaml"
        )
        cfg = load_yaml(cfg_path)
        cfg["fusion"]["args"]["num_agents"] = 3
        cfg["fusion"]["args"]["num_vehicles"] = 10
        ds_clean = build_dataset(cfg, train=False)

        # fabricate the stage-1 dump from GT boxes in each agent's frame
        precalc = {}
        for idx in range(len(ds_clean)):
            scene = ds_clean.backend.scene(idx)
            objs = scene["objects"][:, :2]
            per_agent = []
            for a in scene["agents"]:
                pose = np.asarray(a["pose"], np.float64)
                yaw = np.radians(pose[4])
                c, s = np.cos(yaw), np.sin(yaw)
                rot = np.array([[c, -s], [s, c]])
                centers = (objs - pose[:2]) @ rot
                per_agent.append(
                    {
                        "centers": centers.tolist(),
                        "scores": [0.9] * len(centers),
                    }
                )
            precalc[str(idx)] = per_agent
        pj = str(tmp_path / "stage1_boxes.json")
        with open(pj, "w") as f:
            json.dump(precalc, f)
        return cfg, pj

    def test_injection_refines_noisy_poses(self, tmp_path):
        from heal_tpu.data import build_dataset

        cfg, pj = self._setup(tmp_path)
        noise = {"add_noise": True, "args": {"pos_std": 0.6, "rot_std": 0.0,
                                             "pos_mean": 0, "rot_mean": 0}}
        cfg["noise_setting"] = noise
        np.random.seed(0)
        ds_noisy = build_dataset(cfg, train=False)
        cfg2 = dict(cfg)
        cfg2["box_align"] = {"precalc_path": pj, "args": {}}
        np.random.seed(0)
        ds_aligned = build_dataset(cfg2, train=False)

        cfg_clean = {k: v for k, v in cfg.items() if k != "noise_setting"}
        ds_clean = build_dataset(cfg_clean, train=False)

        # the pairwise affine of the aligned dataset must be closer to the
        # clean one than the noisy dataset's
        def err(ds):
            np.random.seed(0)
            s = ds[0]
            sc = ds_clean[0]
            return np.abs(
                s["pairwise_affine"] - sc["pairwise_affine"]
            ).max()

        e_noisy = err(ds_noisy)
        e_aligned = err(ds_aligned)
        assert e_aligned < e_noisy * 0.5, (e_noisy, e_aligned)

    def test_pose_graph_evaluate_reports_improvement(self, tmp_path):
        import os

        from heal_tpu.config import save_yaml
        from heal_tpu.tools.pose_graph_evaluate import evaluate

        cfg, pj = self._setup(tmp_path)
        md = str(tmp_path / "run")
        os.makedirs(md)
        save_yaml(cfg, os.path.join(md, "config.yaml"))
        report = evaluate(md, precalc_path=pj, stds=(0.4,), max_frames=4)
        r = report["0.4"]
        assert r["trans_refined"]["mean"] < r["trans_noisy"]["mean"]
        assert os.path.exists(os.path.join(md, "pose_graph_eval.json"))
