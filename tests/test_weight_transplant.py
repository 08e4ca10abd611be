"""Weight-transplant forward parity vs the actual PyTorch reference.

Each contract builds the reference module (imported from /root/reference
via tests/ref_shim.py, CPU torch, eval mode, randomized BN affines and
running stats), ports its state_dict into our flax params with
heal_tpu.utils.transplant, runs BOTH on the same input, and asserts
numeric agreement (f32, tol ~1e-4):

  1. PillarVFE + PointPillarScatter vs PointPillarEncoder
     (pillar_vfe.py:10-155, point_pillar_scatter.py:9-77)
  2. ResNetBEVBackbone (BasicBlock stages + deconv deblocks)
     (base_bev_backbone_resnet.py:112-140, resblock.py)
  3. PyramidFusion.forward_single — ResNeXt grouped 3x3 embedded
     block-diagonally into our dense 3x3 (pyramid_fuse.py:65-102)
  4. PyramidFusion.weighted_fuse (pyramid_fuse.py:17-63)
  5. DownsampleConv shrink + cls/reg/dir heads
     (downsample_conv.py, heter_pyramid_collab.py:195-207)
  6. Full HeterPyramidCollab forward on one 2-agent frame
     (heter_pyramid_collab.py:133-209)

Input convention: pillars are generated at FULL capacity (32 points
each). The reference's PFN max-pools over all 32 rows; a padded row is
zero BEFORE the linear, so after BN it contributes relu(BN(0)) — a
nonzero per-channel floor — to the max (pillar_vfe.py:31-53). Our
encoder reduces over valid points only; full pillars make the two
reductions mathematically identical, which is exactly what a weight
transplant contract needs to isolate.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
torch = pytest.importorskip("torch")

from ref_shim import load_reference  # noqa: E402

load_reference()

RNG = np.random.default_rng(7)


def randomize_bn(model):
    """Random BN affines + running stats so eval-mode parity actually
    exercises the transplanted statistics (fresh init is 0/1)."""
    for mod in model.modules():
        if isinstance(
            mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)
        ):
            n = mod.num_features
            mod.weight.data = torch.tensor(
                RNG.uniform(0.8, 1.2, n).astype(np.float32)
            )
            mod.bias.data = torch.tensor(
                RNG.normal(0, 0.05, n).astype(np.float32)
            )
            mod.running_mean.data = torch.tensor(
                RNG.normal(0, 0.05, n).astype(np.float32)
            )
            mod.running_var.data = torch.tensor(
                RNG.uniform(0.8, 1.2, n).astype(np.float32)
            )


def make_pillars(n_pillars, nx, ny, lidar_range, voxel, agents=1, seed=3):
    """Full-capacity pillars: distinct cells x 32 interior points.

    Returns (points (A, K*32, 4) f32, voxel_features (A*K, 32, 4),
    coords (A*K, 4) [agent, z, y, x], num_points (A*K,))."""
    rng = np.random.default_rng(seed)
    pts_all, vf_all, coords_all = [], [], []
    for a in range(agents):
        cells = rng.choice(nx * ny, size=n_pillars, replace=False)
        xi, yi = cells % nx, cells // nx
        u = rng.uniform(0.1, 0.9, (n_pillars, 32))
        v = rng.uniform(0.1, 0.9, (n_pillars, 32))
        x = lidar_range[0] + (xi[:, None] + u) * voxel[0]
        y = lidar_range[1] + (yi[:, None] + v) * voxel[1]
        z = rng.uniform(lidar_range[2], lidar_range[5], (n_pillars, 32))
        i = rng.uniform(0, 1, (n_pillars, 32))
        vf = np.stack([x, y, z, i], axis=-1).astype(np.float32)
        coords = np.stack(
            [np.full(n_pillars, a), np.zeros(n_pillars), yi, xi], axis=1
        ).astype(np.int64)
        pts_all.append(vf.reshape(-1, 4))
        vf_all.append(vf)
        coords_all.append(coords)
    return (
        np.stack(pts_all),
        np.concatenate(vf_all),
        np.concatenate(coords_all),
        np.full(agents * n_pillars, 32, np.int64),
    )


# grid 48 x 24 -> 24 x 12 after the stride-2 branch backbone, divisible
# by the pyramid's 4x total stride
LIDAR_RANGE = [-9.6, -4.8, -3.0, 9.6, 4.8, 1.0]
VOXEL = [0.4, 0.4, 4.0]
NX, NY = 48, 24


class TestPillarEncoderTransplant:
    def test_pillar_vfe_scatter(self):
        import jax
        import jax.numpy as jnp
        from opencood.models.heter_encoders import PointPillar as RefPP

        from heal_tpu.models.encoders import PointPillarEncoder
        from heal_tpu.utils.transplant import transplant_pillar_encoder

        args = {
            "voxel_size": VOXEL,
            "lidar_range": LIDAR_RANGE,
            "pillar_vfe": {
                "use_norm": True,
                "with_distance": False,
                "use_absolute_xyz": True,
                "num_filters": [64],
            },
            "point_pillar_scatter": {"num_features": 64},
        }
        ref = RefPP(dict(args)).eval()
        randomize_bn(ref)

        pts, vf, coords, npts = make_pillars(
            50, NX, NY, LIDAR_RANGE, VOXEL
        )
        with torch.no_grad():
            ref_out = ref(
                {
                    "inputs_m1": {
                        "voxel_features": torch.tensor(vf),
                        "voxel_coords": torch.tensor(coords),
                        "voxel_num_points": torch.tensor(npts),
                    }
                },
                "m1",
            ).numpy()  # (1, 64, NY, NX)

        enc = PointPillarEncoder(
            voxel_size=tuple(VOXEL),
            lidar_range=tuple(LIDAR_RANGE),
            num_filters=(64,),
        )
        points = jnp.asarray(pts)  # (1, N, 4)
        mask = jnp.ones(points.shape[:2], bool)
        variables = enc.init(jax.random.PRNGKey(0), points, mask)
        sd = {k: v for k, v in ref.state_dict().items()}
        p, s = transplant_pillar_encoder(
            {f"encoder_m1.{k}": v for k, v in sd.items()}
        )
        ours = enc.apply(
            {"params": p, "batch_stats": s}, points, mask
        )  # (1, NY, NX, 64)
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref_out, atol=1e-4
        )


class TestResNetBEVBackboneTransplant:
    def test_basic_stages_and_deblocks(self):
        import jax
        import jax.numpy as jnp
        from opencood.models.sub_modules.base_bev_backbone_resnet import (
            ResNetBEVBackbone as RefBackbone,
        )

        from heal_tpu.models.resnet_bev import ResNetBEVBackbone
        from heal_tpu.utils.transplant import transplant_resnet_bev

        cfg = {
            "layer_nums": [3, 2],
            "layer_strides": [2, 2],
            "num_filters": [64, 128],
            "upsample_strides": [1, 2],
            "num_upsample_filter": [64, 64],
        }
        ref = RefBackbone(cfg, 64).eval()
        randomize_bn(ref)
        x = RNG.normal(0, 1, (2, 64, 16, 24)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref({"spatial_features": torch.tensor(x)})[
                "spatial_features_2d"
            ].numpy()

        ours_mod = ResNetBEVBackbone(
            layer_nums=(3, 2),
            layer_strides=(2, 2),
            num_filters=(64, 128),
            upsample_strides=(1, 2),
            num_upsample_filter=(64, 64),
        )
        xin = jnp.asarray(x.transpose(0, 2, 3, 1))
        variables = ours_mod.init(jax.random.PRNGKey(0), xin)
        sd = {f"bb.{k}": v for k, v in ref.state_dict().items()}
        p, s = transplant_resnet_bev(sd, "bb", cfg["layer_nums"])
        out = ours_mod.apply({"params": p, "batch_stats": s}, xin)
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref_out, atol=2e-4
        )


PYR_CFG = {
    "resnext": True,
    "layer_nums": [2, 2, 2],
    "layer_strides": [1, 2, 2],
    "num_filters": [64, 128, 256],
    "upsample_strides": [1, 2, 4],
    "num_upsample_filter": [128, 128, 128],
    "anchor_number": 2,
}


def build_ref_pyramid():
    from opencood.models.fuse_modules.pyramid_fuse import PyramidFusion

    ref = PyramidFusion(dict(PYR_CFG)).eval()
    randomize_bn(ref)
    return ref


class TestPyramidTransplant:
    def test_forward_single_resnext(self):
        """Grouped ResNeXt 3x3 == our dense 3x3 with the block-diagonal
        transplanted kernel, through the whole 3-level pyramid + decode
        + occ heads."""
        import jax
        import jax.numpy as jnp

        from heal_tpu.models.fuse.pyramid import PyramidFusion
        from heal_tpu.utils.transplant import transplant_pyramid

        ref = build_ref_pyramid()
        x = RNG.normal(0, 1, (2, 64, 16, 32)).astype(np.float32)
        with torch.no_grad():
            ref_feat, ref_occ = ref.forward_single(torch.tensor(x))

        ours = PyramidFusion(args=PYR_CFG)
        xin = jnp.asarray(x.transpose(0, 2, 3, 1))
        variables = ours.init(jax.random.PRNGKey(0), xin)
        sd = {f"pyramid_backbone.{k}": v for k, v in ref.state_dict().items()}
        p, s = transplant_pyramid(sd, PYR_CFG)
        feat, occ = ours.apply(
            {"params": p, "batch_stats": s}, xin,
            method=PyramidFusion.forward_single,
        )
        np.testing.assert_allclose(
            np.asarray(feat).transpose(0, 3, 1, 2),
            ref_feat.numpy(),
            atol=3e-4,
        )
        for o_ref, o_ours in zip(ref_occ, occ):
            np.testing.assert_allclose(
                np.asarray(o_ours).transpose(0, 3, 1, 2),
                o_ref.numpy(),
                atol=3e-4,
            )

    def test_weighted_fuse(self):
        """pyramid_fuse.weighted_fuse (regroup + warp + masked softmax
        + weighted sum) vs our masked fixed-L formulation, non-identity
        affine."""
        import jax.numpy as jnp
        from opencood.models.fuse_modules.pyramid_fuse import (
            weighted_fuse as ref_weighted_fuse,
        )

        from heal_tpu.models.fuse.pyramid import weighted_fuse

        b, l, h, w, c = 1, 3, 16, 24, 8
        feats = RNG.normal(0, 1, (l, c, h, w)).astype(np.float32)
        score = (
            1.0 / (1.0 + np.exp(-RNG.normal(0, 1, (l, 1, h, w)))) + 1e-4
        ).astype(np.float32)
        th = 0.15
        affine = np.tile(
            np.eye(2, 3, dtype=np.float32), (b, l, l, 1, 1)
        )
        # ego row: warp collaborators by a small rotation+shift
        rot = np.array(
            [
                [np.cos(th), -np.sin(th) * h / w, 0.1],
                [np.sin(th) * w / h, np.cos(th), -0.05],
            ],
            dtype=np.float32,
        )
        affine[0, 0, 1] = rot
        affine[0, 0, 2] = rot

        with torch.no_grad():
            ref_out = ref_weighted_fuse(
                torch.tensor(feats),
                torch.tensor(score),
                torch.tensor([l]),
                torch.tensor(affine),
                align_corners=False,
            ).numpy()  # (B, C, H, W)

        ours = weighted_fuse(
            jnp.asarray(feats.transpose(0, 2, 3, 1))[None],
            jnp.asarray(score.transpose(0, 2, 3, 1))[None],
            jnp.asarray(affine),
            jnp.ones((b, l), bool),
        )
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref_out, atol=2e-4
        )


class TestShrinkHeadsTransplant:
    def test_downsample_conv_and_heads(self):
        import jax
        import jax.numpy as jnp
        from opencood.models.sub_modules.downsample_conv import (
            DownsampleConv as RefShrink,
        )

        from heal_tpu.models.heads import DetectionHeads
        from heal_tpu.models.layers import DownsampleConv
        from heal_tpu.utils.transplant import (
            transplant_heads,
            transplant_shrink,
        )

        cfg = {
            "input_dim": 384,
            "dim": [256],
            "kernal_size": [3],
            "stride": [1],
            "padding": [1],
        }
        ref = RefShrink(cfg).eval()
        x = RNG.normal(0, 1, (1, 384, 8, 12)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.tensor(x)).numpy()

        ours = DownsampleConv(
            dims=(256,), kernels=(3,), strides=(1,), paddings=(1,)
        )
        xin = jnp.asarray(x.transpose(0, 2, 3, 1))
        ours.init(jax.random.PRNGKey(0), xin)
        sd = {f"shrink_conv.{k}": v for k, v in ref.state_dict().items()}
        p = transplant_shrink(sd)
        out = ours.apply({"params": p}, xin)
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref_out, atol=1e-4
        )

        # heads: 1x1 biased convs
        cls = torch.nn.Conv2d(256, 2, 1)
        reg = torch.nn.Conv2d(256, 14, 1)
        dirh = torch.nn.Conv2d(256, 4, 1)
        feat = RNG.normal(0, 1, (1, 256, 8, 12)).astype(np.float32)
        with torch.no_grad():
            ref_cls = cls(torch.tensor(feat)).numpy()
            ref_reg = reg(torch.tensor(feat)).numpy()
            ref_dir = dirh(torch.tensor(feat)).numpy()
        sd = {}
        for name, mod in (("cls_head", cls), ("reg_head", reg),
                          ("dir_head", dirh)):
            for k, v in mod.state_dict().items():
                sd[f"{name}.{k}"] = v
        heads = DetectionHeads(anchor_number=2, use_dir=True)
        fin = jnp.asarray(feat.transpose(0, 2, 3, 1))
        heads.init(jax.random.PRNGKey(0), fin)
        out = heads.apply({"params": transplant_heads(sd)}, fin)
        np.testing.assert_allclose(
            np.asarray(out["cls_preds"]).transpose(0, 3, 1, 2),
            ref_cls, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["reg_preds"]).transpose(0, 3, 1, 2),
            ref_reg, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["dir_preds"]).transpose(0, 3, 1, 2),
            ref_dir, atol=1e-5,
        )


class TestFullModelTransplant:
    def test_heter_pyramid_collab_forward(self):
        """Full-model contract: reference HeterPyramidCollab (m1) on one
        2-agent frame == ours with the transplanted state_dict (identity
        poses; the non-identity warp path is covered by
        test_weighted_fuse and TestWarpParity)."""
        import jax
        import jax.numpy as jnp
        from opencood.models.heter_pyramid_collab import (
            HeterPyramidCollab as RefModel,
        )

        from heal_tpu.models import build_model
        from heal_tpu.utils.transplant import (
            transplant_heter_pyramid_collab,
        )

        args = {
            "lidar_range": LIDAR_RANGE,
            "norm": "batch",
            "m1": {
                "core_method": "point_pillar",
                "sensor_type": "lidar",
                "encoder_args": {
                    "voxel_size": VOXEL,
                    "lidar_range": LIDAR_RANGE,
                    "pillar_vfe": {
                        "use_norm": True,
                        "with_distance": False,
                        "use_absolute_xyz": True,
                        "num_filters": [64],
                    },
                    "point_pillar_scatter": {"num_features": 64},
                },
                "backbone_args": {
                    "layer_nums": [3],
                    "layer_strides": [2],
                    "num_filters": [64],
                },
                "aligner_args": {"core_method": "identity"},
            },
            "fusion_backbone": dict(PYR_CFG),
            "shrink_header": {
                "kernal_size": [3], "stride": [1], "padding": [1],
                "dim": [256], "input_dim": 384,
            },
            "in_head": 256,
            "anchor_number": 2,
            "dir_args": {
                "dir_offset": 0.7853, "num_bins": 2, "anchor_yaw": [0, 90],
            },
        }
        ref = RefModel(dict(args)).eval()
        randomize_bn(ref)

        agents = 2
        pts, vf, coords, npts = make_pillars(
            40, NX, NY, LIDAR_RANGE, VOXEL, agents=agents, seed=11
        )
        eye = np.tile(np.eye(4, dtype=np.float32),
                      (1, agents, agents, 1, 1))
        with torch.no_grad():
            ref_out = ref(
                {
                    "inputs_m1": {
                        "voxel_features": torch.tensor(vf),
                        "voxel_coords": torch.tensor(coords),
                        "voxel_num_points": torch.tensor(npts),
                    },
                    "agent_modality_list": ["m1"] * agents,
                    "record_len": torch.tensor([agents]),
                    "pairwise_t_matrix": torch.tensor(eye),
                }
            )

        model = build_model(
            {"core_method": "heter_pyramid_collab", "args": args}
        )
        ident = np.tile(
            np.eye(2, 3, dtype=np.float32), (1, agents, agents, 1, 1)
        )
        batch = {
            "inputs_m1": {
                "points": jnp.asarray(pts)[None],  # (1, A, N, 4)
                "point_mask": jnp.ones((1, agents, pts.shape[1]), bool),
            },
            "slots_m1": jnp.asarray([[0, 1]], jnp.int32),
            "agent_mask": jnp.ones((1, agents), bool),
            "pairwise_affine": jnp.asarray(ident),
        }
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        variables = transplant_heter_pyramid_collab(
            ref.state_dict(), variables, args
        )
        out = model.apply(variables, batch, train=False)

        for key in ("cls_preds", "reg_preds", "dir_preds"):
            ours_k = np.asarray(out[key]).transpose(0, 3, 1, 2)
            ref_k = ref_out[key].numpy()
            np.testing.assert_allclose(ours_k, ref_k, atol=5e-4)
        for o_ref, o_ours in zip(
            ref_out["occ_single_list"], out["occ_single_list"]
        ):
            np.testing.assert_allclose(
                np.asarray(o_ours).transpose(0, 3, 1, 2),
                o_ref.numpy(),
                atol=5e-4,
            )
