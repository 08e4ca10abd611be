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


class TestFusionZooTransplant:
    def test_att_fusion_vs_reference(self):
        """AttFusion (fusion_in_one.py:126-151): regroup + ego-warp +
        per-pixel scaled-dot-product agent attention. Parameter-free, so
        the contract is a forward A/B on the same features and a
        non-identity ego-row affine — it proves our masked fixed-L
        formulation equals the reference's ragged one.
        (The reference's DiscoFusion imports disco_fuse.PixelWeightLayer,
        a module absent from the reference tree — unrunnable dead code,
        so AttFusion is the fusion-zoo contract per VERDICT item 3c.)"""
        import jax.numpy as jnp
        from opencood.models.fuse_modules.fusion_in_one import (
            AttFusion as RefAtt,
        )

        from heal_tpu.models.fuse.fusion_in_one import AttFusion

        b, l, h, w, c = 1, 3, 16, 24, 8
        feats = RNG.normal(0, 1, (l, c, h, w)).astype(np.float32)
        th = 0.12
        affine = np.tile(np.eye(2, 3, dtype=np.float32), (b, l, l, 1, 1))
        rot = np.array(
            [
                [np.cos(th), -np.sin(th) * h / w, 0.08],
                [np.sin(th) * w / h, np.cos(th), -0.04],
            ],
            dtype=np.float32,
        )
        affine[0, 0, 1] = rot
        affine[0, 0, 2] = rot

        ref = RefAtt(c).eval()
        with torch.no_grad():
            ref_out = ref(
                torch.tensor(feats),
                torch.tensor([l]),
                torch.tensor(affine),
            ).numpy()  # (B, C, H, W)

        ours = AttFusion()
        import jax

        xin = jnp.asarray(feats.transpose(0, 2, 3, 1))[None]
        variables = ours.init(
            jax.random.PRNGKey(0), xin, jnp.asarray(affine),
            jnp.ones((b, l), bool),
        )
        out = ours.apply(
            variables, xin, jnp.asarray(affine), jnp.ones((b, l), bool)
        )
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref_out, atol=2e-4
        )

    def test_att_fusion_padded_slots_are_invisible(self):
        """Padded agent slots must not change the attention result —
        the fixed-L padding contract the reference's ragged regroup
        never needs."""
        import jax
        import jax.numpy as jnp

        from heal_tpu.models.fuse.fusion_in_one import AttFusion

        b, l, h, w, c = 1, 4, 8, 12, 8
        feats = RNG.normal(0, 1, (b, l, h, w, c)).astype(np.float32)
        affine = np.tile(np.eye(2, 3, dtype=np.float32), (b, l, l, 1, 1))
        mask3 = np.array([[True, True, True, False]])
        ours = AttFusion()
        v = ours.init(
            jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(affine),
            jnp.asarray(mask3),
        )
        out3 = ours.apply(
            v, jnp.asarray(feats), jnp.asarray(affine), jnp.asarray(mask3)
        )
        garbage = feats.copy()
        garbage[:, 3] = RNG.normal(0, 100, (b, h, w, c))
        out3b = ours.apply(
            v, jnp.asarray(garbage), jnp.asarray(affine), jnp.asarray(mask3)
        )
        np.testing.assert_allclose(
            np.asarray(out3), np.asarray(out3b), atol=1e-4
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


class TestSecondEncoderTransplant:
    def test_second_vs_reference_spconv(self):
        """VERDICT r4 item 3b: reference SECOND encoder (MeanVFE +
        VoxelBackBone8x + HeightCompression, run through the pure-torch
        spconv shim in ref_shim.py — exact spconv semantics via dense
        conv on a small grid) == our SecondRefEncoder (oracle sparse
        engine, ops/sparse_conv.py) with the transplanted state_dict.
        Covers submanifold convs, three strided downsamples including
        conv4's (0,1,1) padding, the anisotropic (3,1,1)/(2,1,1)
        conv_out, BN running stats, and the reference's C*D channel
        fold."""
        import jax
        import jax.numpy as jnp
        from opencood.models.heter_encoders import SECOND as RefSecond

        from heal_tpu.models.second import SecondRefEncoder
        from heal_tpu.utils.transplant import transplant_second_encoder

        lidar_range = [-8.0, -3.2, -3.0, 8.0, 3.2, 1.0]
        voxel = [0.4, 0.4, 4.0 / 24]  # nx=40, ny=16, nz=24 (z+1=25)
        nx, ny, nz = 40, 16, 24
        args = {
            "lidar_range": lidar_range,
            "voxel_size": voxel,
            "mean_vfe": {"num_point_features": 4},
            "spconv": {"num_features_in": 4, "num_features_out": 128},
            "map2bev": {"feature_num": 128},
        }
        ref = RefSecond(args).eval()
        randomize_bn(ref)

        # one point per distinct voxel -> MeanVFE output == the raw point
        rng = np.random.default_rng(5)
        k = 300
        cells = rng.choice(nx * ny * nz, size=k, replace=False)
        zi = cells // (ny * nx)
        yi = (cells // nx) % ny
        xi = cells % nx
        u = rng.uniform(0.2, 0.8, (3, k))
        px = lidar_range[0] + (xi + u[0]) * voxel[0]
        py = lidar_range[1] + (yi + u[1]) * voxel[1]
        pz = lidar_range[2] + (zi + u[2]) * voxel[2]
        pi = rng.uniform(0, 1, k)
        pts = np.stack([px, py, pz, pi], axis=-1).astype(np.float32)

        vf = torch.tensor(pts[:, None, :])  # (V, 1, 4)
        coords = torch.tensor(
            np.stack([np.zeros(k), zi, yi, xi], axis=1).astype(np.int64)
        )
        npts = torch.ones(k, dtype=torch.long)
        with torch.no_grad():
            ref_bev = ref(
                {
                    "inputs_m3": {
                        "voxel_features": vf,
                        "voxel_coords": coords,
                        "voxel_num_points": npts,
                    }
                },
                "m3",
            ).numpy()  # (1, C*D, H, W)

        # capacities per level must hold the spconv site sets: conv2's
        # output grid is (13, 8, 20) = 2080 cells and ~300 inputs spread
        # over it activate most of a dilated neighborhood
        ours = SecondRefEncoder(
            voxel_size=voxel,
            lidar_range=lidar_range,
            max_voxels=(512, 2304, 512, 64, 16),
        )
        jp = jnp.asarray(pts)[None]
        jm = jnp.ones((1, k), bool)
        variables = ours.init(jax.random.PRNGKey(0), jp, jm, train=False)
        p, s = transplant_second_encoder(ref.state_dict(), "")
        # nest under the vmap wrapper module name
        (wrap_name,) = variables["params"].keys()
        variables = {
            "params": {wrap_name: p},
            "batch_stats": {wrap_name: s},
        }
        out = ours.apply(variables, jp, jm, train=False)  # (1, H, W, C*D)
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref_bev, atol=2e-4
        )
        assert np.abs(ref_bev).max() > 0  # non-degenerate


class TestHmsaTransplant:
    def test_hgt_cav_attention_vs_reference(self):
        """V2XViT's core: HGTCavAttention (hmsa.py) — per-TYPE q/k/v/out
        projections + per-type-pair relation matrices inside the
        attention bilinear form and the message transform. Weights
        transplanted from the torch module into our typed-one-hot HMSA;
        forward A/B on a mixed-type agent set."""
        import jax
        import jax.numpy as jnp
        from opencood.models.sub_modules.hmsa import HGTCavAttention

        from heal_tpu.models.fuse.v2xvit import HMSA

        dim, heads, dh, t_num = 16, 2, 8, 2
        b, l, h, w = 1, 3, 4, 6
        ref = HGTCavAttention(
            dim, heads=heads, num_types=t_num,
            num_relations=t_num * t_num, dim_head=dh, dropout=0.0,
        ).eval()

        x = RNG.normal(0, 1, (b, l, h, w, dim)).astype(np.float32)
        types = np.array([[0, 1, 0]], np.int64)
        mask = np.ones((b, h, w, l, 1), np.float32)
        prior = np.zeros((b, l, h, w, 3), np.float32)
        prior[..., 2] = types[:, :, None, None]

        with torch.no_grad():
            ref_out = ref(
                torch.tensor(x),
                torch.tensor(mask),
                torch.tensor(prior),
            ).numpy()  # (B, L, H, W, C)

        ours = HMSA(dim=heads * dh, heads=heads, num_types=t_num)
        jx = jnp.asarray(x)
        jm = jnp.ones((b, l), bool)
        jt = jnp.asarray(types, jnp.int32)
        variables = ours.init(
            jax.random.PRNGKey(0), jx, jm, jt, False
        )

        sd = ref.state_dict()

        def typed(prefix, transpose):
            ws, bs = [], []
            for t in range(t_num):
                wt = np.asarray(sd[f"{prefix}.{t}.weight"], np.float32)
                ws.append(wt.T if transpose else wt)
                bs.append(np.asarray(sd[f"{prefix}.{t}.bias"], np.float32))
            return {"kernel": np.stack(ws), "bias": np.stack(bs)}

        params = {
            "q": typed("q_linears", True),
            "k": typed("k_linears", True),
            "v": typed("v_linears", True),
            "proj": typed("a_linears", True),
            "relation_att": np.asarray(
                sd["relation_att"], np.float32
            ).reshape(t_num, t_num, heads, dh, dh),
            "relation_msg": np.asarray(
                sd["relation_msg"], np.float32
            ).reshape(t_num, t_num, heads, dh, dh),
        }
        out = ours.apply({"params": params}, jx, jm, jt, False)
        np.testing.assert_allclose(
            np.asarray(out), ref_out, atol=2e-5
        )
        assert np.abs(ref_out).max() > 0


class TestMswinTransplant:
    def test_base_window_attention_vs_reference(self):
        """V2XViT's MSwin branch: BaseWindowAttention (mswin.py) — fused
        no-bias to_qkv, relative-position bias table, windowed softmax,
        to_out projection. Weights split into our flax MHA params (the
        reference's head-shared rel-pos table broadcasts exactly into
        our per-head table)."""
        import jax
        import jax.numpy as jnp
        from opencood.models.sub_modules.mswin import BaseWindowAttention

        from heal_tpu.models.fuse.v2xvit import WindowAttention

        dim, heads, ws = 16, 2, 2
        dh = dim // heads
        b, l, h, w = 1, 2, 4, 6
        ref = BaseWindowAttention(
            dim, heads=heads, dim_head=dh, drop_out=0.0, window_size=ws,
            relative_pos_embedding=True,
        ).eval()
        x = RNG.normal(0, 1, (b, l, h, w, dim)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.tensor(x)).numpy()

        ours = WindowAttention(dim=dim, window=ws, heads=heads)
        jx = jnp.asarray(x.reshape(b * l, h, w, dim))
        variables = ours.init(jax.random.PRNGKey(0), jx, False)

        sd = ref.state_dict()
        wqkv = np.asarray(sd["to_qkv.weight"], np.float32)  # (3*inner, dim)
        inner = dim
        wq, wk, wv = (
            wqkv[:inner].T, wqkv[inner : 2 * inner].T, wqkv[2 * inner :].T
        )  # each (dim, inner)

        def mha_kernel(wt):
            return wt.reshape(dim, heads, dh)

        wout = np.asarray(sd["to_out.0.weight"], np.float32)  # (dim, inner)
        bout = np.asarray(sd["to_out.0.bias"], np.float32)
        pos = np.asarray(sd["pos_embedding"], np.float32)  # (2w-1, 2w-1)
        # our table: ((2w-1)^2, heads) indexed by dy*(2w-1)+dx — the
        # reference's head-shared table broadcast to every head
        table = np.repeat(pos.reshape(-1, 1), heads, axis=1)

        params = {
            "MultiHeadDotProductAttention_0": {
                "query": {
                    "kernel": mha_kernel(wq),
                    "bias": np.zeros((heads, dh), np.float32),
                },
                "key": {
                    "kernel": mha_kernel(wk),
                    "bias": np.zeros((heads, dh), np.float32),
                },
                "value": {
                    "kernel": mha_kernel(wv),
                    "bias": np.zeros((heads, dh), np.float32),
                },
                "out": {
                    "kernel": wout.T.reshape(heads, dh, dim),
                    "bias": bout,
                },
            },
            "rel_pos_bias": table,
        }
        out = ours.apply({"params": params}, jx, False)
        np.testing.assert_allclose(
            np.asarray(out).reshape(b, l, h, w, dim), ref_out, atol=2e-5
        )
        assert np.abs(ref_out).max() > 0


class TestLssGeometrySplatParity:
    def test_geometry_and_voxel_pooling_vs_reference(self):
        """VERDICT r4 item 3b (LSS): the camera TRUNK is a documented
        substitution (our conv trunk vs the reference's EfficientNet —
        weights cannot map), so the contract covers everything around
        it: frustum creation, get_geometry (undo augmentation, pixel ->
        agent-frame unprojection) and voxel_pooling (depth-weighted
        splat, z collapse) on identical injected depth/feature tensors.
        The reference ctor is cuda-bound (heter_encoders.py:93-100);
        built via __new__ with CPU tensors."""
        import jax.numpy as jnp
        from opencood.models.heter_encoders import LiftSplatShoot
        from opencood.utils.camera_utils import (
            depth_discretization as ref_ddisc,
            gen_dx_bx as ref_gen_dx_bx,
        )

        from heal_tpu.models.lift_splat_shoot import LiftSplatShootEncoder

        gc = {
            # generous bounds: every frustum point strictly inside the
            # grid, so the reference's trunc-vs-floor edge case at cell
            # boundaries (voxel_pooling .long()) cannot trigger
            "xbound": [-64.0, 64.0, 0.4],
            "ybound": [-64.0, 64.0, 0.4],
            "zbound": [-10.0, 10.0, 20.0],
            "ddiscr": [2.0, 40.0, 8],
            "mode": "LID",
        }
        final_dim = (64, 96)
        ds_rate = 16
        ncam, c = 2, 8
        fh, fw = final_dim[0] // ds_rate, final_dim[1] // ds_rate

        ref = LiftSplatShoot.__new__(LiftSplatShoot)
        torch.nn.Module.__init__(ref)
        ref.grid_conf = gc
        ref.data_aug_conf = {"final_dim": final_dim}
        ref.downsample = ds_rate
        ref.camC = c
        dx, bx, nx = ref_gen_dx_bx(gc["xbound"], gc["ybound"], gc["zbound"])
        ref.dx, ref.bx, ref.nx = dx, bx, nx.long()
        ref.frustum = ref.create_frustum()
        ref.use_quickcumsum = False  # plain cumsum_trick (same math)
        ref.D = ref.frustum.shape[0]

        # random-but-valid camera rig: yaw rotations + offsets, mild
        # post-augmentation transforms
        def rot_z(a):
            c_, s_ = np.cos(a), np.sin(a)
            return np.array(
                [[c_, -s_, 0], [s_, c_, 0], [0, 0, 1]], np.float32
            )

        rots = np.stack(
            [rot_z(0.4), rot_z(-1.2)]
        )[None]  # (1, N, 3, 3)
        trans = np.array([[[1.0, 0.5, 1.6], [-0.8, 0.2, 1.5]]], np.float32)
        intrins = np.tile(
            np.array(
                [[70.0, 0, 48.0], [0, 70.0, 32.0], [0, 0, 1]], np.float32
            ),
            (1, ncam, 1, 1),
        )
        post_rots = np.tile(np.eye(3, dtype=np.float32), (1, ncam, 1, 1))
        post_rots[0, :, 0, 0] = 0.95
        post_rots[0, :, 1, 1] = 1.05
        post_trans = np.zeros((1, ncam, 3), np.float32)
        post_trans[0, :, 0] = 2.0

        with torch.no_grad():
            geom_ref = ref.get_geometry(
                torch.tensor(rots), torch.tensor(trans),
                torch.tensor(intrins), torch.tensor(post_rots),
                torch.tensor(post_trans),
            )  # (1, N, D, fH, fW, 3)
            vol = RNG.normal(
                0, 1, (1, ncam, ref.D, fh, fw, c)
            ).astype(np.float32)
            bev_ref = ref.voxel_pooling(
                geom_ref, torch.tensor(vol)
            ).numpy()  # (1, C, ny, nx)

        enc = LiftSplatShootEncoder(
            args={
                "grid_conf": gc,
                "data_aug_conf": {"final_dim": list(final_dim)},
                "img_downsample": ds_rate,
                "img_features": c,
                "pool": "sum",
            }
        )
        geom_ours = enc.apply(
            {},
            fh, fw,
            jnp.asarray(rots[0]), jnp.asarray(trans[0]),
            jnp.asarray(intrins[0]), jnp.asarray(post_rots[0]),
            jnp.asarray(post_trans[0]),
            method=LiftSplatShootEncoder.geometry,
        )  # (N, D, fH, fW, 3)
        np.testing.assert_allclose(
            np.asarray(geom_ours), geom_ref[0].numpy(), atol=1e-4
        )
        bev_ours = enc.apply(
            {},
            np.asarray(geom_ours).reshape(-1, 3),
            jnp.asarray(vol[0].reshape(-1, c)),
            method=LiftSplatShootEncoder._splat,
        )  # (ny, nx, C)
        np.testing.assert_allclose(
            np.asarray(bev_ours).transpose(2, 0, 1),
            bev_ref[0],
            atol=2e-4,
        )
        assert np.abs(bev_ref).max() > 0


class TestFullModelTransplant:
    def _run_contract(
        self,
        lidar_range,
        nx,
        ny,
        agents,
        n_pillars,
        pyr_cfg,
        poses=None,
        atol=5e-4,
        seed=11,
    ):
        """Reference HeterPyramidCollab (m1) on one frame == ours with
        the transplanted state_dict. ``poses``: optional per-agent
        (x, y, yaw) SE(2) poses — builds real non-identity pairwise
        transforms (identity when None)."""
        import jax
        import jax.numpy as jnp
        from opencood.models.heter_pyramid_collab import (
            HeterPyramidCollab as RefModel,
        )

        from heal_tpu.models import build_model
        from heal_tpu.utils.transplant import (
            transplant_heter_pyramid_collab,
        )

        args = self._args(lidar_range, pyr_cfg)
        ref = RefModel(dict(args)).eval()
        randomize_bn(ref)

        pts, vf, coords, npts = make_pillars(
            n_pillars, nx, ny, lidar_range, VOXEL, agents=agents, seed=seed
        )
        if poses is None:
            t44 = np.tile(
                np.eye(4, dtype=np.float32), (1, agents, agents, 1, 1)
            )
        else:
            mats = []
            for x, y, yaw in poses:
                m = np.eye(4, dtype=np.float32)
                c, s = np.cos(yaw), np.sin(yaw)
                m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
                m[0, 3], m[1, 3] = x, y
                mats.append(m)
            t44 = np.zeros((1, agents, agents, 4, 4), np.float32)
            for i in range(agents):
                inv = np.linalg.inv(mats[i])
                for j in range(agents):
                    t44[0, i, j] = inv @ mats[j]
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
                    "pairwise_t_matrix": torch.tensor(t44),
                }
            )

        model = build_model(
            {"core_method": "heter_pyramid_collab", "args": args}
        )
        from heal_tpu.utils.transform_np import normalize_pairwise_tfm

        h_m = lidar_range[4] - lidar_range[1]
        w_m = lidar_range[3] - lidar_range[0]
        affine = normalize_pairwise_tfm(t44, h_m, w_m, 1.0).astype(
            np.float32
        )
        batch = {
            "inputs_m1": {
                "points": jnp.asarray(pts)[None],  # (1, A, N, 4)
                "point_mask": jnp.ones((1, agents, pts.shape[1]), bool),
            },
            "slots_m1": jnp.arange(agents, dtype=jnp.int32)[None],
            "agent_mask": jnp.ones((1, agents), bool),
            "pairwise_affine": jnp.asarray(affine),
        }
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        variables = transplant_heter_pyramid_collab(
            ref.state_dict(), variables, args
        )
        out = model.apply(variables, batch, train=False)

        for key in ("cls_preds", "reg_preds", "dir_preds"):
            ours_k = np.asarray(out[key]).transpose(0, 3, 1, 2)
            ref_k = ref_out[key].numpy()
            np.testing.assert_allclose(ours_k, ref_k, atol=atol)
        for o_ref, o_ours in zip(
            ref_out["occ_single_list"], out["occ_single_list"]
        ):
            np.testing.assert_allclose(
                np.asarray(o_ours).transpose(0, 3, 1, 2),
                o_ref.numpy(),
                atol=atol,
            )

    @staticmethod
    def _args(lidar_range, pyr_cfg):
        return {
            "lidar_range": lidar_range,
            "norm": "batch",
            "m1": {
                "core_method": "point_pillar",
                "sensor_type": "lidar",
                "encoder_args": {
                    "voxel_size": VOXEL,
                    "lidar_range": lidar_range,
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
            "fusion_backbone": dict(pyr_cfg),
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

    def test_heter_pyramid_collab_forward(self):
        """Full-model contract at module-test scale: 2 agents, identity
        poses, 2-block pyramid (non-identity poses and flagship scale in
        the test below)."""
        self._run_contract(
            LIDAR_RANGE, NX, NY, agents=2, n_pillars=40, pyr_cfg=PYR_CFG
        )

    @pytest.mark.slow
    def test_heter_pyramid_collab_flagship_scale(self):
        """VERDICT r4 item 3a: the full-model contract at FLAGSHIP scale
        — 512x256 BEV (204.8 m x 102.4 m at 0.4 m voxels), 5 agents,
        3-stage [3,5,8] pyramid, real non-identity SE(2) poses."""
        lidar_range = [-102.4, -51.2, -3.0, 102.4, 51.2, 1.0]
        flagship_pyr = dict(
            PYR_CFG,
            layer_nums=[3, 5, 8],
        )
        poses = [
            (0.0, 0.0, 0.0),
            (12.0, 4.0, 0.25),
            (-18.0, -6.0, -0.4),
            (30.0, 10.0, 1.1),
            (-42.0, 2.5, 2.7),
        ]
        self._run_contract(
            lidar_range,
            512,
            256,
            agents=5,
            n_pillars=1500,
            pyr_cfg=flagship_pyr,
            poses=poses,
            # deeper stack + bigger reductions accumulate more f32
            # rounding; still parity-grade (preds are O(1) logits)
            atol=2e-3,
            seed=13,
        )
