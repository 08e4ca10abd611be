"""Late- and early-fusion sample assembly.

Reference: data_utils/datasets/late_fusion_dataset.py (per-agent
independent samples; train -> one random agent, test -> all agents with
ego-transform matrices) and early_fusion_dataset.py (all agents' points
projected into the ego frame, single voxelization).
"""
from __future__ import annotations

import numpy as np

from ..utils import transform_np
from .scene import IntermediateAssembler


def _maybe_augment(assembler, points, gt_hwl, gt_mask):
    """Joint point/box augmentation (late/early only, like the ref)."""
    aug_cfg = assembler.params.get("data_augment")
    if not aug_cfg or not assembler.train:
        return points, gt_hwl
    from .augmentor import DataAugmentor

    n = int(gt_mask.sum())
    boxes_lwh = gt_hwl[:n][:, [0, 1, 2, 5, 4, 3, 6]].copy()
    points, boxes_lwh = DataAugmentor(aug_cfg, True)(points, boxes_lwh)
    out = gt_hwl.copy()
    out[:n] = boxes_lwh[:, [0, 1, 2, 5, 4, 3, 6]]
    return points, out


class LateAssembler(IntermediateAssembler):
    """Late fusion: each agent is an independent single-agent sample.

    Train: one random in-range agent (its own frame, its own labels).
    Test: ego sample + per-agent samples with transformation matrices to
    ego so detections can be projected and cross-agent-NMS'd
    (ref late_fusion_dataset.py: get_item_train/get_item_test).
    """

    def assemble(self, scene: dict) -> dict:
        agents = scene["agents"]
        clean_poses = [np.asarray(a["pose"], dtype=np.float64) for a in agents]
        if self.train:
            idx = int(np.random.randint(len(agents)))
            return self._single_sample(scene, idx, clean_poses, np.eye(4))
        # test: ego's sample; other agents exposed via agent_samples
        sample = self._single_sample(scene, 0, clean_poses, np.eye(4))
        others = []
        for i in range(1, len(agents)):
            d = np.linalg.norm(clean_poses[i][:2] - clean_poses[0][:2])
            if d > self.comm_range:
                continue
            t = transform_np.x1_to_x2(clean_poses[i], clean_poses[0])
            others.append(
                self._single_sample(scene, i, clean_poses, t)
            )
        sample["agent_samples"] = others
        return sample

    def _single_sample(self, scene, idx, poses, t_to_ego):
        agent = scene["agents"][idx]
        pts = self._range_filter(
            np.asarray(agent["points"], dtype=np.float32)
        )
        gt, gt_mask = self._gt_in_frame(
            scene["objects"], poses[idx], self.gt_range
        )
        pts, gt = _maybe_augment(self, pts, gt, gt_mask)
        pts = self._range_filter(pts)
        n = min(len(pts), self.max_points)
        points = np.zeros((self.max_points, 4), dtype=np.float32)
        pmask = np.zeros(self.max_points, dtype=bool)
        # presort AFTER truncation (keeps the kept subset unbiased) —
        # a presorted=True encoder silently corrupts its sorted scatter
        # on unsorted points, so every packing site must do this
        points[:n] = self._presort(pts[:n])
        pmask[:n] = True

        from ..postprocess import generate_targets

        label = generate_targets(
            gt, gt_mask, self.anchors, self.pos_thr, self.neg_thr, self.order
        )
        # eval-time GT is the EGO-frame GT (ref: gt from ego in late eval)
        gt_ego, gt_ego_mask = self._gt_in_frame(
            scene["objects"], poses[0], self.gt_range
        )
        sample = {
            "points": points,
            "point_mask": pmask,
            "pos_equal_one": label["pos_equal_one"],
            "neg_equal_one": label["neg_equal_one"],
            "targets": label["targets"],
            "gt_boxes": gt_ego.astype(np.float32),
            "gt_mask": gt_ego_mask.astype(np.float32),
            "transformation_matrix": t_to_ego.astype(np.float32),
        }
        if self.params.get("heter"):
            self._pack_heter_single(sample, scene, idx, agent)
        return sample

    def _pack_heter_single(self, sample, scene, idx, agent):
        """Late-heter packing: every modality key is present (zeros when
        it isn't this agent's type) plus a one-hot ``modality_flags`` so
        batches stay static-shape across mixed-modality samples
        (ref late_heter_fusion_dataset.py per-modality processors)."""
        mod = agent.get("modality", "m1")
        flags = np.zeros(len(self.modalities), np.float32)
        for k, m in enumerate(self.modalities):
            active = m == mod
            if active:
                flags[k] = 1.0
            if self.sensor_type(m) == "lidar":
                if active:
                    inputs = {
                        "points": sample["points"],
                        "point_mask": sample["point_mask"],
                    }
                else:
                    inputs = {
                        "points": np.zeros_like(sample["points"]),
                        "point_mask": np.zeros_like(sample["point_mask"]),
                    }
                sample[f"inputs_{m}"] = inputs
            else:
                if active:
                    cams = self._pack_cameras(scene, [idx], [0], m, 1)
                else:
                    cams = self._pack_cameras(scene, [], [], m, 1)
                sample[f"inputs_{m}"] = {
                    k: v[0] for k, v in cams.items()
                }
        sample["modality_flags"] = flags


class EarlyAssembler(IntermediateAssembler):
    """Early fusion: all in-range agents' raw points projected into the
    ego frame and merged before a single voxelization
    (ref early_fusion_dataset.py)."""

    def assemble(self, scene: dict) -> dict:
        agents = scene["agents"]
        clean_poses = [np.asarray(a["pose"], dtype=np.float64) for a in agents]

        merged = []
        for i, agent in enumerate(agents):
            d = np.linalg.norm(clean_poses[i][:2] - clean_poses[0][:2])
            if i > 0 and d > self.comm_range:
                continue
            pts = np.asarray(agent["points"], dtype=np.float64)
            t = transform_np.x1_to_x2(clean_poses[i], clean_poses[0])
            xyz = (
                np.concatenate([pts[:, :3], np.ones((len(pts), 1))], axis=1)
                @ t.T
            )[:, :3]
            merged.append(
                np.concatenate([xyz, pts[:, 3:4]], axis=1).astype(np.float32)
            )
        pts = self._range_filter(np.concatenate(merged, axis=0))
        gt, gt_mask = self._gt_in_frame(
            scene["objects"], clean_poses[0], self.gt_range
        )
        pts, gt = _maybe_augment(self, pts, gt, gt_mask)
        pts = self._range_filter(pts)
        if self.train and len(pts) > self.max_points:
            sel = np.random.choice(len(pts), self.max_points, replace=False)
            pts = pts[sel]
        n = min(len(pts), self.max_points)
        points = np.zeros((self.max_points, 4), dtype=np.float32)
        pmask = np.zeros(self.max_points, dtype=bool)
        points[:n] = self._presort(pts[:n])  # sorted-scatter contract
        pmask[:n] = True

        from ..postprocess import generate_targets

        label = generate_targets(
            gt, gt_mask, self.anchors, self.pos_thr, self.neg_thr, self.order
        )
        return {
            "points": points,
            "point_mask": pmask,
            "pos_equal_one": label["pos_equal_one"],
            "neg_equal_one": label["neg_equal_one"],
            "targets": label["targets"],
            "gt_boxes": gt.astype(np.float32),
            "gt_mask": gt_mask.astype(np.float32),
            "transformation_matrix": np.eye(4, dtype=np.float32),
        }
