"""LSS camera branch: geometry, splat, and m1+m2 heterogeneous training."""
import os

import numpy as np
import pytest

CFG_DIR = os.path.join(os.path.dirname(__file__), "configs")


class TestCameraUtils:
    def test_depth_discretization_lid(self):
        from heal_tpu.utils.camera import depth_discretization

        d = depth_discretization(2, 50, 16, "LID")
        assert len(d) == 16
        assert d[0] == 2.0
        assert np.all(np.diff(d) > 0)
        # bin widths increase linearly
        w = np.diff(d)
        assert np.all(np.diff(w) > 0)

    def test_bin_depths_roundtrip(self):
        from heal_tpu.utils.camera import bin_depths, depth_discretization

        centers = depth_discretization(2, 50, 16, "LID")
        idx, mask = bin_depths(centers + 1e-3, "LID", 2, 50, 16)
        assert (idx == np.arange(16)).all()

    def test_render_depth_map(self):
        from heal_tpu.utils.camera import (
            default_camera_rig,
            default_intrinsics,
            render_depth_map,
        )

        rot, trans = default_camera_rig(1)[0]  # looking along +x
        K = default_intrinsics(64, 64)
        pts = np.array([[10.0, 0.0, 1.9, 0.5]])  # straight ahead
        depth = render_depth_map(pts, rot, trans, K, 64, 64, 16)
        assert depth.shape == (4, 4)
        # lands near the image center with depth ~10
        assert abs(depth[depth > 0][0] - 10.0) < 0.5


class TestLSSGeometry:
    def test_frustum_unprojection_consistency(self):
        """A frustum point at depth d along the optical axis must land at
        distance d in front of the camera in the agent frame."""
        import jax.numpy as jnp

        from heal_tpu.models.lift_splat_shoot import LiftSplatShootEncoder
        from heal_tpu.utils.camera import (
            default_camera_rig,
            default_intrinsics,
        )

        args = {
            "grid_conf": {
                "xbound": [-38.4, 38.4, 1.2],
                "ybound": [-38.4, 38.4, 1.2],
                "zbound": [-10, 10, 20.0],
                "ddiscr": [2, 30, 16],
                "mode": "LID",
            },
            "data_aug_conf": {"final_dim": [128, 192]},
            "img_downsample": 16,
            "img_features": 32,
        }
        enc = LiftSplatShootEncoder(args=args)
        rig = default_camera_rig(1)
        K = default_intrinsics(128, 192)
        rots = jnp.asarray(np.stack([rig[0][0]]), jnp.float32)
        trans = jnp.asarray(np.stack([rig[0][1]]), jnp.float32)
        intrins = jnp.asarray(np.stack([K]), jnp.float32)
        eye = jnp.eye(3)[None]
        zero = jnp.zeros((1, 3))

        import jax

        geom = enc.bind({}).geometry(8, 12, rots, trans, intrins, eye, zero)
        assert geom.shape == (1, 16, 8, 12, 3)
        # center pixel, some depth bin k: point ~ depth_values[k] ahead (+x)
        from heal_tpu.utils.camera import depth_discretization

        dv = depth_discretization(2, 30, 16, "LID")
        p = np.asarray(geom[0, 5, 4, 6])  # near image center
        assert abs(p[0] - dv[5]) < 1.5  # x ahead approximately the depth
        assert abs(p[2] - 1.9) < 1.0  # near camera height


class TestHeterM1M2:
    def test_two_modality_train_step(self):
        import jax

        from heal_tpu.config import load_yaml
        from heal_tpu.data import build_dataset
        from heal_tpu.losses import build_loss
        from heal_tpu.models import build_model
        from heal_tpu.parallel import Trainer
        from heal_tpu.parallel.schedulers import build_optimizer
        from heal_tpu.parallel.trainer import to_device

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_heter_m1m2.yaml"))
        cfg["fusion"]["args"]["num_agents"] = 2
        ds = build_dataset(cfg, train=True)
        sample = ds[0]
        assert "inputs_m2" in sample
        assert sample["inputs_m2"]["imgs"].shape[1:] == (4, 128, 192, 3)
        # agents alternate modality: slot packing must be disjoint
        s1 = set(sample["slots_m1"][sample["slots_m1"] < 3])
        s2 = set(sample["slots_m2"][sample["slots_m2"] < 3])
        assert not (s1 & s2)

        model = build_model(cfg["model"])
        criterion = build_loss(cfg["loss"])
        tx = build_optimizer(cfg["optimizer"], cfg.get("lr_scheduler"), 4)
        trainer = Trainer(
            model=model, criterion=criterion, tx=tx, supervise_single=True
        ).compile()
        batch = to_device(next(ds.batches(1)))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        state, aux = trainer.train_step(state, batch)
        assert np.isfinite(float(aux["total_loss"]))
        assert "depth_loss" in aux, sorted(aux)
        # eval path (camera FOV masks active) also runs
        out = trainer.eval_step(state, batch)
        assert np.isfinite(float(out["total_loss"]))
