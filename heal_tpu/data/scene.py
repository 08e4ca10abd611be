"""Scene -> fixed-shape training/eval samples.

The assembler owns everything between "raw scene" (agent poses + sensor
data + world-frame object boxes) and the static-shape arrays the models
consume. It replaces the reference's intermediate_heter_fusion_dataset
__getitem__/collate (comm-range filter :342-351, modality packing
:414-439, pairwise transforms, fused + per-agent labels :451-563,
record_len concat collate :566-723) with mask/padding conventions:

  * agents padded to ``max_cav`` (slot 0 = ego), ``agent_mask`` marks real
    slots; per-modality packing uses flat ``slots_mX`` indices into the
    (B*L + 1) scatter space (last slot = dump for padding);
  * per-agent point clouds padded to ``max_points``;
  * GT boxes padded to ``max_num``.
"""
from __future__ import annotations

import numpy as np

from ..postprocess import generate_anchor_box, generate_targets
from ..utils import box_np, transform_np
from ..utils.common import limit_period
from ..utils.pose_noise import add_pose_noise

MODALITY_KEYS = ("m1", "m2", "m3", "m4")


class IntermediateAssembler:
    """Heterogeneous intermediate-fusion sample assembly."""

    def __init__(self, params: dict, train: bool = True):
        self.params = params
        self.train = train
        post = params["postprocess"]
        self.order = post["order"]
        self.anchors = generate_anchor_box(post["anchor_args"], self.order)
        self.pos_thr = post["target_args"]["pos_threshold"]
        self.neg_thr = post["target_args"]["neg_threshold"]
        self.max_num = post.get("max_num", 100)
        self.max_cav = params["train_params"].get("max_cav", 5)
        self.comm_range = params.get("comm_range", 70)
        self.gt_range = post.get(
            "gt_range", post["anchor_args"]["cav_lidar_range"]
        )
        self.cav_range = params["preprocess"]["cav_lidar_range"]
        self.max_points = params["preprocess"]["args"].get(
            "max_points", 30000
        )
        self.supervise_single = params.get("model", {}).get("args", {}).get(
            "supervise_single", False
        )
        self.noise_setting = params.get("noise_setting", {"add_noise": False})
        heter = params.get("heter")
        self.modalities = (
            sorted(heter["modality_setting"].keys()) if heter else ["m1"]
        )

    # ------------------------------------------------------------------
    def assemble(self, scene: dict) -> dict:
        """scene: {'agents': [{'pose', 'modality', 'points' (N,4)}...],
        'objects': (K, 7) world-frame lwh boxes}. Agent 0 is the ego.

        Returns a dict of numpy arrays for ONE sample (unbatched).
        """
        agents = scene["agents"]
        clean_poses = [np.asarray(a["pose"], dtype=np.float64) for a in agents]
        # noisy poses drive the feature warps; labels stay on clean poses
        # (reference keeps lidar_pose_clean for GT, pose_utils.py:9-40)
        if self.noise_setting.get("add_noise", False):
            poses = add_pose_noise(clean_poses, self.noise_setting["args"])
        else:
            poses = clean_poses

        # comm-range filter w.r.t. ego, keep ego first, cap at max_cav
        keep = [0]
        for i in range(1, len(agents)):
            d = np.linalg.norm(poses[i][:2] - poses[0][:2])
            if d <= self.comm_range:
                keep.append(i)
        keep = keep[: self.max_cav]

        L = self.max_cav
        n_valid = len(keep)
        agent_mask = np.zeros(L, dtype=bool)
        agent_mask[:n_valid] = True
        modality = [agents[i].get("modality", "m1") for i in keep]

        pairwise = transform_np.get_pairwise_transformation(
            [poses[i] for i in keep], L
        )
        # metric normalization (H, W in meters, voxel size 1) makes the
        # affine resolution-independent (ref heter_pyramid_collab.py:80-82)
        metric_h = self.cav_range[4] - self.cav_range[1]
        metric_w = self.cav_range[3] - self.cav_range[0]
        pairwise_affine = transform_np.normalize_pairwise_tfm(
            pairwise, metric_h, metric_w, 1.0
        )

        # per-agent padded points (own frame)
        pts = np.zeros((L, self.max_points, 4), dtype=np.float32)
        pmask = np.zeros((L, self.max_points), dtype=bool)
        for slot, i in enumerate(keep):
            p = np.asarray(agents[i]["points"], dtype=np.float32)
            p = self._range_filter(p)
            n = min(len(p), self.max_points)
            if self.train and len(p) > self.max_points:
                sel = np.random.choice(len(p), self.max_points, replace=False)
                p = p[sel]
            pts[slot, :n] = p[:n]
            pmask[slot, :n] = True

        # fused labels in (clean) ego frame
        gt_ego, gt_mask = self._gt_in_frame(
            scene["objects"], clean_poses[0], self.gt_range
        )
        label = generate_targets(
            gt_ego, gt_mask, self.anchors, self.pos_thr, self.neg_thr,
            self.order,
        )

        sample = {
            "agent_mask": agent_mask,
            "agent_modality": np.array(
                [MODALITY_KEYS.index(m) for m in modality]
                + [len(MODALITY_KEYS)] * (L - n_valid),
                dtype=np.int32,
            ),
            "points": pts,
            "point_mask": pmask,
            "pairwise_t_matrix": pairwise.astype(np.float32),
            "pairwise_affine": pairwise_affine.astype(np.float32),
            "pos_equal_one": label["pos_equal_one"],
            "neg_equal_one": label["neg_equal_one"],
            "targets": label["targets"],
            "gt_boxes": gt_ego.astype(np.float32),
            "gt_mask": gt_mask.astype(np.float32),
            "transformation_matrix": np.eye(4, dtype=np.float32),
        }

        if self.supervise_single:
            pos_s, neg_s, tgt_s = [], [], []
            for slot in range(L):
                if slot < n_valid:
                    gt_a, m_a = self._gt_in_frame(
                        scene["objects"], clean_poses[keep[slot]], self.gt_range
                    )
                    lab = generate_targets(
                        gt_a, m_a, self.anchors, self.pos_thr, self.neg_thr,
                        self.order,
                    )
                    pos_s.append(lab["pos_equal_one"])
                    neg_s.append(lab["neg_equal_one"])
                    tgt_s.append(lab["targets"])
                else:
                    # padded slot: zero pos AND zero neg -> zero loss weight
                    pos_s.append(np.zeros_like(label["pos_equal_one"]))
                    neg_s.append(np.zeros_like(label["neg_equal_one"]))
                    tgt_s.append(np.zeros_like(label["targets"]))
            sample["pos_equal_one_single"] = np.stack(pos_s)
            sample["neg_equal_one_single"] = np.stack(neg_s)
            sample["targets_single"] = np.stack(tgt_s)
        return sample

    # ------------------------------------------------------------------
    def _range_filter(self, points: np.ndarray) -> np.ndarray:
        r = self.cav_range
        m = (
            (points[:, 0] >= r[0])
            & (points[:, 0] <= r[3])
            & (points[:, 1] >= r[1])
            & (points[:, 1] <= r[4])
            & (points[:, 2] >= r[2])
            & (points[:, 2] <= r[5])
        )
        return points[m]

    def _gt_in_frame(self, objects_world, pose, limit_range):
        """World lwh boxes -> padded hwl boxes in the given agent frame."""
        out = np.zeros((self.max_num, 7), dtype=np.float64)
        mask = np.zeros(self.max_num, dtype=np.float64)
        if objects_world is None or len(objects_world) == 0:
            return out, mask
        objs = np.asarray(objects_world, dtype=np.float64)
        t = np.linalg.inv(transform_np.x_to_world(pose))
        centers = box_np.project_points(objs[:, :3], t)
        # rotate yaw by the frame change (assume near-planar transforms)
        dyaw = np.arctan2(t[1, 0], t[0, 0])
        boxes = np.concatenate(
            [centers, objs[:, 3:6], limit_period(objs[:, 6:7] + dyaw)], axis=1
        )
        _, m = box_np.mask_boxes_outside_range(
            boxes, limit_range, "lwh", min_num_corners=1, return_mask=True
        )
        boxes = boxes[m][: self.max_num]
        n = len(boxes)
        # to hwl order for the label pipeline
        out[:n] = boxes[:, [0, 1, 2, 5, 4, 3, 6]]
        mask[:n] = 1.0
        return out, mask


def collate(samples: list, modalities=("m1",)) -> dict:
    """Stack samples and build per-modality packed inputs + slot indices.

    All arrays are batch-major ((B, ...)) so the whole batch shards over a
    data-parallel mesh axis. ``slots_mX`` is (B, L_m) with values in
    [0, L]; L is the per-sample dump slot for padding; L_m = L (worst
    case) keeps shapes static across batches.
    """
    batch = {}
    for k in samples[0].keys():
        if k == "agent_samples":  # late-fusion test-time per-agent list
            batch[k] = [s[k] for s in samples]
            continue
        batch[k] = np.stack([s[k] for s in samples])

    if "agent_mask" not in batch:  # single-agent (late/early) samples
        return batch
    b, l = batch["agent_mask"].shape
    for mi, m in enumerate(modalities):
        slots = np.full((b, l), l, dtype=np.int32)
        pts = np.zeros((b, l) + batch["points"].shape[2:], dtype=np.float32)
        msk = np.zeros((b, l) + batch["point_mask"].shape[2:], dtype=bool)
        for bi in range(b):
            n = 0
            for li in range(l):
                if (
                    batch["agent_mask"][bi, li]
                    and batch["agent_modality"][bi, li] == mi
                ):
                    slots[bi, n] = li
                    pts[bi, n] = batch["points"][bi, li]
                    msk[bi, n] = batch["point_mask"][bi, li]
                    n += 1
        batch[f"inputs_{m}"] = {"points": pts, "point_mask": msk}
        batch[f"slots_{m}"] = slots
    return batch
