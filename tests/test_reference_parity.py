"""Differential numeric parity against the installed PyTorch reference.

Every test imports the ACTUAL reference code from /root/reference (CPU
torch) via tests/ref_shim.py and A/Bs it against heal_tpu on identical
random inputs. This replaces self-certified parity: the comparison target
is the reference implementation itself, not our reimplementation of it.

Contracts (>= 6 per the round-2 verdict, tolerance <= 1e-5 unless the
quantity is statistical):
  1. pose -> SE(3) (x_to_world) and relative transforms (x1_to_x2)
  2. get_pairwise_transformation over a mock cav dict
  3. normalize_pairwise_tfm (the BEV-warp affine normalization)
  4. boxes_to_corners_3d, both hwl and lwh orders
  5. box_encode / box_decode (VoxelNet codec) + delta_to_boxes3d
  6. project_box3d / project_points_by_matrix_torch
  7. warp_affine_simple vs ops.warp.affine_warp (both backends' core
     spatial-transform primitive)
  8. polygon rotated IoU: reference compute_iou/convert_format (running
     on the shim's Sutherland-Hodgman Polygon — an implementation
     independent from our line-integral kernel) vs utils.rotated_iou
  9. PointPillarLoss forward (cls+reg+dir) on identical tensors
 10. limit_period
 11. depth binning UD/LID/SID (camera_utils.bin_depths)
 12. pose-noise distributions (statistical: moments at fixed seeds)
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
torch = pytest.importorskip("torch")

from ref_shim import load_reference  # noqa: E402

load_reference()


# --------------------------------------------------------------- helpers
def t(x):
    return torch.as_tensor(np.asarray(x))


RNG = np.random.default_rng(42)


def rand_poses(n):
    out = RNG.uniform(-1, 1, (n, 6)) * np.array([50, 50, 3, 10, 180, 10])
    return out


def rand_boxes_hwl(n):
    b = np.zeros((n, 7))
    b[:, 0:2] = RNG.uniform(-40, 40, (n, 2))
    b[:, 2] = RNG.uniform(-2, 1, n)
    b[:, 3] = RNG.uniform(1.2, 2.2, n)  # h
    b[:, 4] = RNG.uniform(1.5, 2.4, n)  # w
    b[:, 5] = RNG.uniform(3.0, 5.0, n)  # l
    b[:, 6] = RNG.uniform(-np.pi, np.pi, n)
    return b


class TestTransformationParity:
    def test_x_to_world(self):
        import opencood.utils.transformation_utils as ref_t

        from heal_tpu.utils import transform_np

        for pose in rand_poses(16):
            np.testing.assert_allclose(
                transform_np.x_to_world(pose),
                ref_t.x_to_world(list(pose)),
                atol=1e-9,
            )

    def test_x1_to_x2(self):
        import opencood.utils.transformation_utils as ref_t

        from heal_tpu.utils import transform_np

        poses = rand_poses(8)
        for i in range(0, 8, 2):
            np.testing.assert_allclose(
                transform_np.x1_to_x2(poses[i], poses[i + 1]),
                ref_t.x1_to_x2(list(poses[i]), list(poses[i + 1])),
                atol=1e-8,
            )

    def test_get_pairwise_transformation(self):
        from collections import OrderedDict

        import opencood.utils.transformation_utils as ref_t

        from heal_tpu.utils import transform_np

        poses = rand_poses(4)
        base = OrderedDict(
            (i, {"params": {"lidar_pose": list(p)}})
            for i, p in enumerate(poses)
        )
        ref = ref_t.get_pairwise_transformation(base, 5, proj_first=False)
        ours = transform_np.get_pairwise_transformation(list(poses), 5)
        np.testing.assert_allclose(ours, ref, atol=1e-8)

    def test_normalize_pairwise_tfm(self):
        import opencood.utils.transformation_utils as ref_t

        from heal_tpu.utils import transform_np

        poses = rand_poses(3)
        pair = transform_np.get_pairwise_transformation(list(poses), 3)
        pair_b = pair[None]  # (1, L, L, 4, 4)
        h, w, ratio = 128, 256, 0.4
        ref = ref_t.normalize_pairwise_tfm(
            t(pair_b).float(), h, w, ratio
        ).numpy()
        ours = transform_np.normalize_pairwise_tfm(pair_b, h, w, ratio)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_limit_period(self):
        import opencood.utils.common_utils as ref_c

        from heal_tpu.utils.common import limit_period

        vals = RNG.uniform(-10, 10, 64)
        np.testing.assert_allclose(
            np.asarray(limit_period(vals, 0.5, 2 * np.pi)),
            ref_c.limit_period(t(vals), 0.5, 2 * np.pi).numpy(),
            atol=1e-9,
        )


class TestBoxParity:
    @pytest.mark.parametrize("order", ["hwl", "lwh"])
    def test_boxes_to_corners_3d(self, order):
        import opencood.utils.box_utils as ref_b

        from heal_tpu.utils import box_np

        boxes = rand_boxes_hwl(12)
        ref = ref_b.boxes_to_corners_3d(t(boxes).float(), order).numpy()
        ours = box_np.boxes_to_corners_3d(boxes, order)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_box_encode_decode(self):
        """Our hwl codec vs reference box_encode/box_decode (xyzwlhr):
        identical residuals after the dim permutation."""
        import opencood.utils.box_utils as ref_b

        from heal_tpu.utils import box_np

        boxes = rand_boxes_hwl(32)
        anchors = rand_boxes_hwl(32)
        # hwl (x y z h w l r) -> reference layout (x y z w l h r)
        to_ref = [0, 1, 2, 4, 5, 3, 6]
        ref_enc = ref_b.box_encode(
            t(boxes[:, to_ref]).float(), t(anchors[:, to_ref]).float()
        ).numpy()
        ours_enc = box_np.box_encode(boxes, anchors)
        np.testing.assert_allclose(
            ours_enc[:, to_ref], ref_enc, atol=1e-5
        )
        ref_dec = ref_b.box_decode(
            t(ref_enc), t(anchors[:, to_ref]).float()
        ).numpy()
        ours_dec = box_np.box_decode(ours_enc, anchors)
        np.testing.assert_allclose(
            ours_dec[:, to_ref], ref_dec, atol=1e-4
        )

    def test_delta_to_boxes3d(self):
        """Dense decode: VoxelPostprocessor.delta_to_boxes3d vs our
        box_decode on the same anchor grid."""
        from opencood.data_utils.post_processor.voxel_postprocessor import (
            VoxelPostprocessor,
        )

        from heal_tpu.utils import box_np

        H, W, A = 4, 6, 2
        anchors = rand_boxes_hwl(H * W * A).reshape(H, W, A, 7)
        deltas = RNG.normal(0, 0.1, (1, H, W, A * 7)).astype(np.float32)
        # reference wants deltas NCHW (N, 14, H, W) and anchors (W?, L, 2, 7)
        ref = VoxelPostprocessor.delta_to_boxes3d(
            t(deltas).permute(0, 3, 1, 2).contiguous(), t(anchors).float()
        ).numpy()[0]
        ours = box_np.box_decode(
            deltas.reshape(-1, 7), anchors.reshape(-1, 7)
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_project_box3d_and_points(self):
        import opencood.utils.box_utils as ref_b

        from heal_tpu.utils import box_np, transform_np

        corners = RNG.normal(0, 20, (10, 8, 3)).astype(np.float32)
        tfm = transform_np.x_to_world(rand_poses(1)[0]).astype(np.float32)
        np.testing.assert_allclose(
            box_np.project_box3d(corners, tfm),
            ref_b.project_box3d(t(corners), t(tfm)).numpy(),
            atol=1e-4,
        )
        pts = RNG.normal(0, 20, (50, 3)).astype(np.float32)
        np.testing.assert_allclose(
            box_np.project_points(pts, tfm),
            ref_b.project_points_by_matrix_torch(
                t(pts), t(tfm)
            ).numpy(),
            atol=1e-4,
        )

    def test_rotated_polygon_iou(self):
        """Reference compute_iou/convert_format (Sutherland–Hodgman shim
        polygon — an independent clipping implementation) vs our
        line-integral rotated-IoU kernel."""
        import opencood.utils.common_utils as ref_c

        from heal_tpu.utils import box_np
        from heal_tpu.utils.rotated_iou import rotated_iou_matrix

        boxes = rand_boxes_hwl(12)
        corners = box_np.boxes_to_corners_3d(boxes, "hwl")
        bev = corners[:, :4, :2]  # (N, 4, 2) BEV footprint
        polys = ref_c.convert_format(bev)
        ref_iou = np.stack(
            [ref_c.compute_iou(p, list(polys)) for p in polys]
        )
        ours = np.asarray(rotated_iou_matrix(bev, bev))
        np.testing.assert_allclose(ours, ref_iou, atol=1e-5)


class TestWarpParity:
    def test_warp_affine_simple(self):
        from opencood.models.sub_modules.torch_transformation_utils import (
            warp_affine_simple,
        )

        from heal_tpu.ops.warp import affine_warp

        h, w, c = 24, 40, 3
        src = RNG.normal(0, 1, (1, c, h, w)).astype(np.float32)
        th = 0.3
        M = np.array(
            [
                [np.cos(th), -np.sin(th) * h / w, 0.12],
                [np.sin(th) * w / h, np.cos(th), -0.2],
            ],
            dtype=np.float32,
        )
        ref = warp_affine_simple(t(src), t(M)[None], (h, w)).numpy()
        ours = np.asarray(
            affine_warp(src[0].transpose(1, 2, 0), M)
        ).transpose(2, 0, 1)
        # f32 bilinear interpolation: both backends accumulate ~1e-5 ULP
        # noise in the gather weights
        np.testing.assert_allclose(ours, ref[0], atol=1e-4)


class TestLossParity:
    def _args(self):
        return {
            "pos_cls_weight": 2.0,
            "cls": {"alpha": 0.25, "gamma": 2.0, "weight": 1.0},
            "reg": {"sigma": 3.0, "weight": 2.0, "codewise": True},
            "dir": {
                "weight": 0.2,
                "args": {
                    "dir_offset": 0.7853,
                    "num_bins": 2,
                    "anchor_yaw": [0, 90],
                },
            },
        }

    def test_point_pillar_loss_forward(self):
        from opencood.loss.point_pillar_loss import (
            PointPillarLoss as RefLoss,
        )

        import jax.numpy as jnp

        from heal_tpu.losses.point_pillar_loss import PointPillarLoss

        H, W, A = 8, 10, 2
        b = 2
        cls_preds = RNG.normal(0, 1, (b, H, W, A)).astype(np.float32)
        reg_preds = RNG.normal(0, 0.3, (b, H, W, A * 7)).astype(np.float32)
        dir_preds = RNG.normal(0, 1, (b, H, W, A * 2)).astype(np.float32)
        pos = (RNG.uniform(size=(b, H, W, A)) < 0.05).astype(np.float32)
        neg = ((RNG.uniform(size=(b, H, W, A)) < 0.8) * (1 - pos)).astype(
            np.float32
        )
        targets = RNG.normal(0, 0.2, (b, H, W, A * 7)).astype(np.float32)

        args = self._args()
        ours = PointPillarLoss(args)
        total, aux = ours(
            {
                "cls_preds": jnp.asarray(cls_preds),
                "reg_preds": jnp.asarray(reg_preds),
                "dir_preds": jnp.asarray(dir_preds),
            },
            {
                "pos_equal_one": jnp.asarray(pos),
                "neg_equal_one": jnp.asarray(neg),
                "targets": jnp.asarray(targets),
            },
        )

        ref = RefLoss(args)
        ref_total = ref(
            {
                "cls_preds": t(cls_preds).permute(0, 3, 1, 2),
                "reg_preds": t(reg_preds).permute(0, 3, 1, 2),
                "dir_preds": t(dir_preds).permute(0, 3, 1, 2),
                "batch_size": b,
            },
            {
                "pos_equal_one": t(pos),
                "neg_equal_one": t(neg),
                "targets": t(targets),
            },
        )
        assert abs(float(total) - float(ref_total)) < 1e-3, (
            float(total),
            float(ref_total),
        )
        for k, ref_k in [
            ("cls_loss", "cls_loss"),
            ("reg_loss", "reg_loss"),
            ("dir_loss", "dir_loss"),
        ]:
            assert (
                abs(float(aux[k]) - float(ref.loss_dict[ref_k])) < 1e-3
            ), (k, float(aux[k]), float(ref.loss_dict[ref_k]))


class TestPixorVoxelNetLossParity:
    """Faithful PixorLoss / VoxelNetLoss vs the torch reference
    (VERDICT r4 item 8; ref loss/pixor_loss.py, loss/voxel_net_loss.py)."""

    def test_pixor_loss_forward(self):
        from opencood.loss.pixor_loss import PixorLoss as RefLoss

        import jax.numpy as jnp

        from heal_tpu.losses.pixor_loss import PixorLoss

        b, H, W = 2, 12, 16
        cls_preds = RNG.normal(0, 1, (b, H, W, 1)).astype(np.float32)
        reg_preds = RNG.normal(0, 0.5, (b, H, W, 6)).astype(np.float32)
        label_map = RNG.normal(0, 1, (b, H, W, 7)).astype(np.float32)
        label_map[..., 0] = (RNG.uniform(size=(b, H, W)) < 0.1).astype(
            np.float32
        )

        args = {"alpha": 1.5, "beta": 1.0}
        ours = PixorLoss(args)
        total, aux = ours(
            {"cls": jnp.asarray(cls_preds), "reg": jnp.asarray(reg_preds)},
            {"label_map": jnp.asarray(label_map)},
        )
        ref = RefLoss(args)
        ref_total = ref(
            {
                "cls": t(cls_preds).permute(0, 3, 1, 2),
                "reg": t(reg_preds).permute(0, 3, 1, 2),
            },
            {"label_map": t(label_map).permute(0, 3, 1, 2)},
        )
        assert abs(float(total) - float(ref_total)) < 1e-4
        for k in ("cls_loss", "reg_loss"):
            assert abs(float(aux[k]) - float(ref.loss_dict[k])) < 1e-4

        # zero-positive frame: the no-division branch must also match
        label_map[..., 0] = 0.0
        total0, _ = ours(
            {"cls": jnp.asarray(cls_preds), "reg": jnp.asarray(reg_preds)},
            {"label_map": jnp.asarray(label_map)},
        )
        ref_total0 = ref(
            {
                "cls": t(cls_preds).permute(0, 3, 1, 2),
                "reg": t(reg_preds).permute(0, 3, 1, 2),
            },
            {"label_map": t(label_map).permute(0, 3, 1, 2)},
        )
        assert abs(float(total0) - float(ref_total0)) < 1e-4

    def test_voxel_net_loss_forward(self):
        from opencood.loss.voxel_net_loss import VoxelNetLoss as RefLoss

        import jax.numpy as jnp

        from heal_tpu.losses.voxel_net_loss import VoxelNetLoss

        b, H, W, A = 2, 8, 10, 2
        psm = RNG.normal(0, 1, (b, H, W, A)).astype(np.float32)
        rm = RNG.normal(0, 0.5, (b, H, W, A * 7)).astype(np.float32)
        pos = (RNG.uniform(size=(b, H, W, A)) < 0.05).astype(np.float32)
        neg = ((RNG.uniform(size=(b, H, W, A)) < 0.8) * (1 - pos)).astype(
            np.float32
        )
        targets = RNG.normal(0, 0.3, (b, H, W, A * 7)).astype(np.float32)

        args = {"alpha": 1.5, "beta": 1.0, "reg": 2.0}
        ours = VoxelNetLoss(args)
        total, aux = ours(
            {"psm": jnp.asarray(psm), "rm": jnp.asarray(rm)},
            {
                "pos_equal_one": jnp.asarray(pos),
                "neg_equal_one": jnp.asarray(neg),
                "targets": jnp.asarray(targets),
            },
        )
        ref = RefLoss(args)
        ref_total = ref(
            {
                "psm": t(psm).permute(0, 3, 1, 2),
                "rm": t(rm).permute(0, 3, 1, 2),
            },
            {
                "pos_equal_one": t(pos),
                "neg_equal_one": t(neg),
                "targets": t(targets),
            },
        )
        assert abs(float(total) - float(ref_total)) < 1e-4
        for k in ("reg_loss", "conf_loss"):
            assert abs(float(aux[k]) - float(ref.loss_dict[k])) < 1e-4

    def test_pixor_label_map_vs_reference(self):
        from opencood.data_utils.post_processor.bev_postprocessor import (
            BevPostprocessor,
        )

        from heal_tpu.postprocess.targets import generate_pixor_label_map

        res, ds = 0.4, 4
        lidar_range = [-16.0, -8.0, -3.0, 16.0, 8.0, 1.0]
        label_shape = (
            int((lidar_range[3] - lidar_range[0]) / res / ds),
            int((lidar_range[4] - lidar_range[1]) / res / ds),
            7,
        )
        geometry_param = {
            "L1": lidar_range[0], "L2": lidar_range[3],
            "W1": lidar_range[1], "W2": lidar_range[4],
            "H1": lidar_range[2], "H2": lidar_range[5],
            "res": res, "downsample_rate": ds,
            "label_shape": list(label_shape),
        }
        ref_pp = BevPostprocessor(
            {"geometry_param": geometry_param, "order": "lwh"}, train=True
        )
        gt = np.zeros((10, 7), np.float32)
        gt[0] = [2.0, 1.0, 0.0, 4.2, 1.8, 1.6, 0.3]
        gt[1] = [-8.0, -3.0, 0.0, 3.9, 1.7, 1.5, -1.2]
        gt[2] = [10.0, 5.0, 0.0, 4.5, 2.0, 1.7, 2.9]
        mask = np.zeros(10, np.float32)
        mask[:3] = 1

        ref_label = ref_pp.generate_label(gt_box_center=gt, mask=mask)[
            "label_map"
        ]  # (7, H, W)
        ours = generate_pixor_label_map(
            gt, mask, lidar_range, res, ds, label_shape, order="lwh"
        )  # (H, W, 7)
        np.testing.assert_allclose(
            ours, np.transpose(ref_label, (1, 2, 0)), atol=1e-5
        )
        assert ours[..., 0].sum() > 0  # boxes actually rasterized


class TestCameraParity:
    @pytest.mark.parametrize("mode", ["UD", "LID", "SID"])
    def test_bin_depths(self, mode):
        import opencood.utils.camera_utils as ref_cam

        from heal_tpu.utils.camera import bin_depths

        depth = RNG.uniform(0.5, 60.0, (16, 24)).astype(np.float32)
        ref_idx, ref_mask = ref_cam.bin_depths(
            t(depth).clone(), mode, 2.0, 50.0, 32, target=False
        )
        idx, mask = bin_depths(depth, mode, 2.0, 50.0, 32, target=False)
        np.testing.assert_array_equal(
            np.clip(idx, 0, 31), ref_idx.numpy()
        )
        np.testing.assert_array_equal(mask, ref_mask.numpy())


class TestPoseNoiseParity:
    def test_gaussian_and_laplace_moments(self):
        """Same closed-form parameterization as the reference generators:
        compare sample moments at matched seeds (statistical contract)."""
        import opencood.utils.pose_utils as ref_p

        from heal_tpu.utils import pose_noise

        for gen_ref, gen_ours in [
            (ref_p.generate_noise, pose_noise.generate_noise),
            (
                ref_p.generate_noise_laplace,
                pose_noise.generate_noise_laplace,
            ),
        ]:
            np.random.seed(7)
            ref_samples = np.stack(
                [gen_ref(0.4, 3.0) for _ in range(3000)]
            )
            np.random.seed(7)
            our_samples = np.stack(
                [gen_ours(0.4, 3.0) for _ in range(3000)]
            )
            # identical numpy RNG stream -> identical samples
            np.testing.assert_allclose(our_samples, ref_samples, atol=0)

    def test_von_mises_circular_std(self):
        """Reference samples yaw from torch VonMises with kappa =
        (180/(pi*std))^2; ours from numpy with the same kappa. Circular
        stds must agree."""
        import opencood.utils.pose_utils as ref_p

        from heal_tpu.utils import pose_noise

        pose = torch.zeros((4000, 6))
        torch.manual_seed(0)
        ref_noise = ref_p.generate_noise_torch(pose, 0.3, 5.0).numpy()
        # torch VonMises samples radians; ours converts to degrees
        ref_yaw_deg = np.degrees(ref_noise[:, 4])
        np.random.seed(0)
        ours = np.stack(
            [
                pose_noise.generate_noise_von_mises(0.3, 5.0)
                for _ in range(4000)
            ]
        )
        assert abs(ref_yaw_deg.std() - ours[:, 4].std()) < 0.5
        assert abs(ref_noise[:, 0].std() - ours[:, 0].std()) < 0.05


class TestWhere2commParity:
    def test_sinusoidal_pe_vs_add_pe_map(self):
        """Our sinusoidal_pe must reproduce the reference's with_spe
        positional map (where2comm_attn.py:148-169 add_pe_map) exactly."""
        from opencood.models.fuse_modules.where2comm_attn import add_pe_map

        from heal_tpu.models.fuse.fusion_in_one import sinusoidal_pe

        h, w, c = 12, 20, 32
        x = torch.zeros(1, c, h, w)
        ref = add_pe_map(x)[0].permute(1, 2, 0).numpy()  # (h, w, c)
        ours = np.asarray(sinusoidal_pe(h, w, c))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_comm_mask_vs_reference_communication(self):
        """CommMask's smoothed-threshold mask and comm rate must match the
        reference Communication module (comm_modules/where2comm.py:34-79)
        on the same confidence logits (non-ego senders; the reference's
        nodiag overwrite / our ego passthrough are compared downstream of
        the shared per-sender mask math)."""
        import jax
        from opencood.models.comm_modules.where2comm import Communication

        from heal_tpu.models.fuse.where2comm_comm import CommMask

        h, w, l = 16, 24, 4
        logits = RNG.normal(0.0, 2.0, (l, 1, h, w)).astype(np.float32)

        ref_comm = Communication(
            {"thre": 0.2, "gaussian_smooth": {"k_size": 5, "c_sigma": 1.0}}
        )
        with torch.no_grad():
            _, ref_masks, ref_rate = ref_comm(
                [t(logits)], t(np.array([l])), t(np.zeros((1, l, l, 2, 3)))
            )
        ref_masks = ref_masks.detach().numpy()[:, 0]  # (L, H, W)

        conf = jax.nn.sigmoid(np.transpose(logits, (0, 2, 3, 1)))[None]
        (mask, rate), _ = CommMask(
            threshold=0.2, smooth_kernel=5, smooth_sigma=1.0
        ).init_with_output(jax.random.PRNGKey(0), conf, train=False)
        ours = np.asarray(mask)[0, :, :, :, 0]  # (L, H, W)
        # the reference overwrites even-indexed senders' masks with ones
        # (nodiag ego passthrough); the shared threshold math is visible
        # on the odd rows. Allow <=2 cells of float-round-off flips at
        # threshold-boundary values (torch vs XLA conv summation order).
        mism = int((ours[1::2] != ref_masks[1::2]).sum())
        assert mism <= 2, f"{mism} mask cells differ"
        # the reference rate counts sender 0's PRE-overwrite mask, which
        # is exactly our (no-passthrough) row 0
        assert abs(float(ref_rate) - ours[0].mean()) < 1e-3
