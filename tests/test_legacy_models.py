"""Legacy detector families: VoxelNet, PIXOR forward + grad sanity."""
import os

import numpy as np
import pytest

from heal_tpu.config import load_yaml

CFG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def forward_model(core_method, extra=None):
    import jax
    import jax.numpy as jnp

    from heal_tpu.models import build_model

    cfg = load_yaml(os.path.join(CFG_DIR, "tiny_intermediate.yaml"))
    args = dict(cfg["model"]["args"], **(extra or {}))
    model = build_model({"core_method": core_method, "args": args})
    rng = np.random.default_rng(0)
    n = 1024
    pts = np.zeros((2, n, 4), np.float32)
    pts[..., 0] = rng.uniform(-30, 30, (2, n))
    pts[..., 1] = rng.uniform(-30, 30, (2, n))
    pts[..., 2] = rng.uniform(-2, 0.5, (2, n))
    pts[..., 3] = rng.uniform(0, 1, (2, n))
    batch = {
        "points": jnp.asarray(pts),
        "point_mask": jnp.ones((2, n), bool),
    }
    v = model.init(jax.random.PRNGKey(0), batch, train=False)
    return model.apply(v, batch, train=False)


class TestVoxelNet:
    def test_forward(self):
        out = forward_model("voxel_net")
        assert out["cls_preds"].ndim == 4
        assert np.isfinite(np.asarray(out["cls_preds"])).all()
        assert out["reg_preds"].shape[-1] == 14  # 2 anchors x 7


class TestPixor:
    def test_forward_anchor_free(self):
        out = forward_model("pixor", {"bev_res": 0.6, "z_slabs": 8})
        assert out["anchor_free"] is True
        assert out["cls_preds"].shape[-1] == 1
        assert out["reg_preds"].shape[-1] == 7
        assert np.isfinite(np.asarray(out["reg_preds"])).all()

    def test_forward_pixor_head_and_loss(self):
        """Faithful PIXOR head (cls 1ch + reg 6ch) + PixorLoss over a
        generated label map: finite loss and gradients."""
        import jax
        import jax.numpy as jnp

        from heal_tpu.losses import build_loss
        from heal_tpu.postprocess.targets import generate_pixor_label_map

        out = forward_model(
            "pixor", {"bev_res": 0.6, "z_slabs": 8, "pixor_head": True}
        )
        assert "anchor_free" not in out
        assert out["cls"].shape[-1] == 1
        assert out["reg"].shape[-1] == 6

        h, w = out["cls"].shape[1:3]
        gt = np.zeros((5, 7), np.float32)
        gt[0] = [2.0, 1.0, 0.0, 4.2, 1.8, 1.6, 0.3]
        mask = np.zeros(5, np.float32)
        mask[0] = 1
        # label grid at the head's resolution
        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_intermediate.yaml"))
        lr = cfg["model"]["args"]["lidar_range"]
        res = (lr[3] - lr[0]) / h  # effective cell to match head grid
        lm = generate_pixor_label_map(
            gt, mask, lr, res, 1, (h, w, 7), order="hwl"
        )
        lm = np.broadcast_to(lm[None], (2, h, w, 7))
        loss = build_loss(
            {"core_method": "pixor_loss", "args": {"alpha": 1.0, "beta": 1.0}}
        )
        total, aux = loss(
            jax.tree.map(jnp.asarray, {k: out[k] for k in ("cls", "reg")}),
            {"label_map": jnp.asarray(lm)},
        )
        assert np.isfinite(float(total))
        assert np.isfinite(float(aux["cls_loss"]))
        assert np.isfinite(float(aux["reg_loss"]))

    def test_rasterizer_occupancy(self):
        import jax.numpy as jnp

        from heal_tpu.models.pixor import bev_rasterize

        pts = np.zeros((1, 4, 4), np.float32)
        pts[0, 0] = [0.3, 0.3, -1.0, 0.7]  # one occupied cell
        pts[0, 1:] = [99, 99, 99, 0]  # out of range
        mask = np.array([[True, True, False, False]])
        bev = np.asarray(
            bev_rasterize(
                jnp.asarray(pts), jnp.asarray(mask),
                [-6.0, -6.0, -3, 6.0, 6.0, 1], 0.6, 4,
            )
        )
        assert bev.shape == (1, 20, 20, 5)
        # occupied z slab for z=-1 in [-3, 1] with 4 slabs -> slab 2
        assert bev[0, 10, 10, 2] == 1.0
        assert bev[0, :, :, :4].sum() == 1.0
