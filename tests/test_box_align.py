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
