"""Round-2 zoo completions: multiscale PP baseline, DiscoNet pair,
SECOND+SSFA, center-point intermediate, standalone LSS detectors.

Reference counterparts: models/point_pillar_baseline_multiscale.py,
point_pillar_disconet{,_teacher}.py, second_ssfa{,_uncertainty}.py,
center_point_intermediate.py, lift_splat_shoot{,_voxel,_intermediate}.py.
"""
import os

import numpy as np
import pytest

from heal_tpu.config import load_yaml

CFG_DIR = os.path.join(os.path.dirname(__file__), "configs")


@pytest.fixture(scope="module")
def pp_args():
    cfg = load_yaml(os.path.join(CFG_DIR, "tiny_intermediate.yaml"))
    return cfg["model"]["args"]


def _lidar_single(rng, n=512):
    import jax.numpy as jnp

    pts = np.zeros((2, n, 4), np.float32)
    pts[..., 0] = rng.uniform(-30, 30, (2, n))
    pts[..., 1] = rng.uniform(-30, 30, (2, n))
    pts[..., 2] = rng.uniform(-2, 0.5, (2, n))
    pts[..., 3] = rng.uniform(0, 1, (2, n))
    return {
        "points": jnp.asarray(pts),
        "point_mask": jnp.ones((2, n), bool),
    }


def _lidar_agents(rng, b=1, l=2, n=512):
    import jax.numpy as jnp

    pts = np.zeros((b, l, n, 4), np.float32)
    pts[..., 0] = rng.uniform(-30, 30, (b, l, n))
    pts[..., 1] = rng.uniform(-30, 30, (b, l, n))
    pts[..., 2] = rng.uniform(-2, 0.5, (b, l, n))
    pts[..., 3] = rng.uniform(0, 1, (b, l, n))
    ident = np.tile(
        np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32), (b, l, l, 1, 1)
    )
    return {
        "points": jnp.asarray(pts),
        "point_mask": jnp.ones((b, l, n), bool),
        "agent_mask": jnp.ones((b, l), bool),
        "pairwise_affine": jnp.asarray(ident),
    }


def _forward(core_method, args, batch):
    import jax

    from heal_tpu.models import build_model

    model = build_model({"core_method": core_method, "args": args})
    v = model.init(jax.random.PRNGKey(0), batch, train=False)
    return model.apply(v, batch, train=False)


class TestMultiscaleBaseline:
    def test_forward(self, pp_args):
        rng = np.random.default_rng(0)
        out = _forward(
            "point_pillar_baseline_multiscale", pp_args, _lidar_agents(rng)
        )
        assert out["cls_preds"].shape[0] == 1  # fused to ego
        assert np.isfinite(np.asarray(out["cls_preds"])).all()
        assert out["reg_preds"].shape[-1] == 14


class TestDiscoNetPair:
    def test_student_exports_feature(self, pp_args):
        rng = np.random.default_rng(1)
        out = _forward("point_pillar_disconet", pp_args, _lidar_agents(rng))
        assert "feature" in out
        assert np.isfinite(np.asarray(out["feature"])).all()

    def test_teacher_exports_teacher_feature(self, pp_args):
        rng = np.random.default_rng(2)
        out = _forward(
            "point_pillar_disconet_teacher", pp_args, _lidar_single(rng)
        )
        assert "teacher_feature" in out
        assert out["teacher_feature"].ndim == 4


class TestSecondSSFA:
    ARGS = {
        # 64x64x10 voxel grid -> 8x8 BEV after the 8x stack (SSFA's
        # stride-2 semantic branch needs even spatial dims)
        "voxel_size": [0.4, 0.4, 0.4],
        "lidar_range": [-12.8, -12.8, -3, 12.8, 12.8, 1],
        "second": {"channels": [8, 8, 8, 8],
                   "max_voxels": [512, 256, 128, 64]},
        "ssfa": {"feature_num": 16},
        "anchor_number": 2,
        "dir_args": {"num_bins": 2},
        "norm": "batch",
    }

    @pytest.mark.slow
    def test_forward_iou_branch(self):
        rng = np.random.default_rng(3)
        import jax.numpy as jnp

        pts = np.zeros((1, 256, 4), np.float32)
        pts[..., 0] = rng.uniform(-12, 12, (1, 256))
        pts[..., 1] = rng.uniform(-12, 12, (1, 256))
        pts[..., 2] = rng.uniform(-2, 0.5, (1, 256))
        batch = {
            "points": jnp.asarray(pts),
            "point_mask": jnp.ones((1, 256), bool),
        }
        out = _forward("second_ssfa", self.ARGS, batch)
        assert "iou_preds" in out
        assert np.isfinite(np.asarray(out["cls_preds"])).all()

    def test_uncertainty_head(self):
        rng = np.random.default_rng(4)
        import jax.numpy as jnp

        pts = np.zeros((1, 256, 4), np.float32)
        pts[..., 0] = rng.uniform(-12, 12, (1, 256))
        pts[..., 1] = rng.uniform(-12, 12, (1, 256))
        pts[..., 2] = rng.uniform(-2, 0.5, (1, 256))
        batch = {
            "points": jnp.asarray(pts),
            "point_mask": jnp.ones((1, 256), bool),
        }
        out = _forward("second_ssfa_uncertainty", self.ARGS, batch)
        assert out["unc_preds"].shape[-1] == 3 * 2


class TestCenterPointIntermediate:
    def test_forward(self, pp_args):
        rng = np.random.default_rng(5)
        args = {k: v for k, v in pp_args.items() if k != "shrink_header"}
        out = _forward("center_point_intermediate", args, _lidar_agents(rng))
        assert out["anchor_free"] is True
        assert out["reg_preds"].shape[-1] == 7
        assert np.isfinite(np.asarray(out["reg_preds"])).all()


LSS_ARGS = {
    "grid_conf": {
        "xbound": [-19.2, 19.2, 2.4],
        "ybound": [-19.2, 19.2, 2.4],
        "zbound": [-10, 10, 20.0],
        "ddiscr": [2, 30, 8],
        "mode": "LID",
    },
    "data_aug_conf": {"final_dim": [64, 96]},
    "img_downsample": 16,
    "img_features": 16,
    "base_bev_backbone": {
        "layer_nums": [1],
        "layer_strides": [1],
        "num_filters": [32],
        "upsample_strides": [1],
        "num_upsample_filter": [32],
    },
    "anchor_number": 2,
    "norm": "batch",
}


def _camera_batch(rng, b, l=None, ncam=2, ih=64, iw=96):
    import jax.numpy as jnp

    from heal_tpu.utils.camera import default_camera_rig, default_intrinsics

    lead = (b,) if l is None else (b, l)
    rig = default_camera_rig(ncam)
    cams = {
        "imgs": rng.normal(0, 1, lead + (ncam, ih, iw, 3)),
        "rots": np.broadcast_to(
            np.stack([r for r, _ in rig]), lead + (ncam, 3, 3)
        ),
        "trans": np.broadcast_to(
            np.stack([t for _, t in rig]), lead + (ncam, 3)
        ),
        "intrins": np.broadcast_to(
            default_intrinsics(ih, iw), lead + (ncam, 3, 3)
        ),
        "post_rots": np.broadcast_to(np.eye(3), lead + (ncam, 3, 3)),
        "post_trans": np.zeros(lead + (ncam, 3)),
    }
    return {
        k: jnp.asarray(np.ascontiguousarray(v), jnp.float32)
        for k, v in cams.items()
    }


class TestStandaloneLSS:
    def test_single_agent(self):
        rng = np.random.default_rng(6)
        batch = {"camera": _camera_batch(rng, 1)}
        out = _forward("lift_splat_shoot", LSS_ARGS, batch)
        assert out["cls_preds"].shape[0] == 1
        assert "depth_items" in out
        assert np.isfinite(np.asarray(out["cls_preds"])).all()

    def test_voxel_max_pool_variant(self):
        rng = np.random.default_rng(7)
        batch = {"camera": _camera_batch(rng, 1)}
        out = _forward("lift_splat_shoot_voxel", LSS_ARGS, batch)
        assert np.isfinite(np.asarray(out["cls_preds"])).all()

    def test_intermediate_fusion(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(8)
        b, l = 1, 2
        ident = np.tile(
            np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32),
            (b, l, l, 1, 1),
        )
        batch = {
            "inputs_m2": _camera_batch(rng, b, l),
            "agent_mask": jnp.ones((b, l), bool),
            "pairwise_affine": jnp.asarray(ident),
        }
        out = _forward(
            "lift_splat_shoot_intermediate",
            dict(LSS_ARGS, fusion_method="max"),
            batch,
        )
        assert out["cls_preds"].shape[0] == b  # fused to ego
        assert np.isfinite(np.asarray(out["cls_preds"])).all()


def test_pixel_shuffle_deconv_exact():
    """_PixelShuffleDeconv == nn.ConvTranspose for kernel == stride (the
    deblock configuration), same params."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from heal_tpu.models.layers import _PixelShuffleDeconv

    rng = np.random.RandomState(0)
    for s, cin, cout in ((2, 8, 16), (4, 16, 8), (1, 8, 8)):
        x = jnp.asarray(rng.randn(2, 6, 10, cin).astype(np.float32))
        mod = _PixelShuffleDeconv(features=cout, stride=s)
        v = mod.init(jax.random.PRNGKey(0), x)
        ref = nn.ConvTranspose(
            cout, (s, s), strides=(s, s), use_bias=False
        )
        out = mod.apply(v, x)
        out_ref = ref.apply({"params": {"kernel": v["params"]["kernel"]}}, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(out_ref), atol=1e-5
        )
