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

    def test_sid_discretization(self):
        """SID: log-spaced bins (CaDDN), spacing increases with depth
        (ref camera_utils.py:160-162)."""
        from heal_tpu.utils.camera import (
            bin_depths,
            depth_discretization,
            indices_to_depth,
        )

        d = depth_discretization(2, 50, 16, "SID")
        assert len(d) == 16 and abs(d[0] - 2.0) < 1e-9
        w = np.diff(d)
        assert np.all(w > 0) and np.all(np.diff(w) > 0)
        # bin starts land exactly on their own index
        idx, mask = bin_depths(d + 1e-6, "SID", 2, 50, 16)
        assert (idx == np.arange(16)).all() and mask.all()
        # indices_to_depth inverts the bin-start mapping
        np.testing.assert_allclose(
            indices_to_depth(np.arange(16), 2, 50, 16, "SID"), d, atol=1e-9
        )
        # out-of-range depths are masked out and routed to the ignore bin
        idx, mask = bin_depths(np.array([0.5, 80.0]), "SID", 2, 50, 16)
        assert not mask.any() and (idx == 16).all()

    def test_depth_metric_rmse(self):
        """depth_metric (ref tools/inference_utils.py:190): argmax bins
        -> metric depth -> RMSE, no-return pixels (gt == num_bins)
        excluded."""
        from heal_tpu.utils.camera import depth_metric, indices_to_depth

        n_bins = 8
        ddiscr = (2.0, 50.0, n_bins)
        rng = np.random.RandomState(0)
        gt = rng.randint(0, n_bins, (2, 3, 4)).astype(np.int64)
        gt[0, 0, :2] = n_bins  # no lidar return -> excluded
        # logits whose argmax equals gt where valid, off-by-one elsewhere
        pred_idx = np.where(gt < n_bins, gt, 0)
        logits = np.eye(n_bins, dtype=np.float32)[pred_idx.reshape(-1)]
        logits = logits.reshape(2, 3, 4, n_bins)
        sse, n = depth_metric(logits, gt, ddiscr, "LID")
        assert n == int((gt < n_bins).sum())
        assert sse == 0.0  # perfect prediction on valid pixels

        # shift every prediction one bin up: known per-pixel errors
        pred_idx2 = np.clip(pred_idx + 1, 0, n_bins - 1)
        logits2 = np.eye(n_bins, dtype=np.float32)[pred_idx2.reshape(-1)]
        logits2 = logits2.reshape(2, 3, 4, n_bins)
        sse2, n2 = depth_metric(logits2, gt, ddiscr, "LID")
        valid = gt < n_bins
        d_pred = indices_to_depth(pred_idx2[valid], 2.0, 50.0, n_bins, "LID")
        d_gt = indices_to_depth(gt[valid], 2.0, 50.0, n_bins, "LID")
        np.testing.assert_allclose(sse2, ((d_pred - d_gt) ** 2).sum(),
                                   rtol=1e-12)
        assert n2 == n

        # all pixels invalid -> (0, 0), no div-by-zero
        assert depth_metric(logits, np.full_like(gt, n_bins), ddiscr,
                            "LID") == (0.0, 0)

    def test_indices_to_depth_ud_lid(self):
        from heal_tpu.utils.camera import (
            depth_discretization,
            indices_to_depth,
        )

        for mode in ("UD", "LID"):
            np.testing.assert_allclose(
                indices_to_depth(np.arange(16), 2, 50, 16, mode),
                depth_discretization(2, 50, 16, mode),
                atol=1e-9,
            )

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

    @pytest.mark.parametrize("pool", ["sum", "max"])
    def test_presorted_splat_matches_device_path(self, pool):
        """The host splat plan (utils/camera.frustum_splat_plan) must
        reproduce the device geometry+argsort splat exactly: same BEV
        canvas from the same depth probs / features."""
        import jax
        import jax.numpy as jnp

        from heal_tpu.models.lift_splat_shoot import LiftSplatShootEncoder
        from heal_tpu.utils.camera import (
            default_camera_rig,
            default_intrinsics,
            depth_discretization,
            frustum_splat_plan,
        )

        gc = {
            "xbound": [-38.4, 38.4, 1.2],
            "ybound": [-38.4, 38.4, 1.2],
            "zbound": [-10, 10, 20.0],
            "ddiscr": [2, 30, 16],
            "mode": "LID",
        }
        args = {
            "grid_conf": gc,
            "data_aug_conf": {"final_dim": [128, 192]},
            "img_downsample": 16,
            "img_features": 8,
            "pool": pool,
        }
        enc = LiftSplatShootEncoder(args=args)
        rng = np.random.default_rng(0)
        ncam = 3
        rig = default_camera_rig(ncam)
        K = default_intrinsics(128, 192)
        rots = np.stack([r for r, _ in rig]).astype(np.float32)
        trans = np.stack([t for _, t in rig]).astype(np.float32)
        # non-trivial aug homography on one camera
        post_rots = np.tile(np.eye(3, dtype=np.float32), (ncam, 1, 1))
        post_trans = np.zeros((ncam, 3), np.float32)
        post_rots[1, 0, 0] = 1.1
        post_trans[1, :2] = [3.0, -2.0]
        intrins = np.tile(K.astype(np.float32), (ncam, 1, 1))
        imgs = rng.normal(0, 1, (1, ncam, 128, 192, 3)).astype(np.float32)

        base = {
            "imgs": jnp.asarray(imgs),
            "rots": jnp.asarray(rots)[None],
            "trans": jnp.asarray(trans)[None],
            "intrins": jnp.asarray(intrins)[None],
            "post_rots": jnp.asarray(post_rots)[None],
            "post_trans": jnp.asarray(post_trans)[None],
        }
        var = enc.init(jax.random.PRNGKey(0), base, train=False)
        bev_dev, _ = enc.apply(var, base, train=False)

        dv = depth_discretization(2, 30, 16, "LID")
        ids, widx = frustum_splat_plan(
            rots, trans, intrins, post_rots, post_trans,
            dv, 128, 192, 16, gc,
        )
        with_plan = dict(
            base,
            splat_ids=jnp.asarray(ids)[None],
            splat_widx=jnp.asarray(widx)[None],
        )
        bev_pre, _ = enc.apply(var, with_plan, train=False)
        np.testing.assert_allclose(
            np.asarray(bev_dev), np.asarray(bev_pre), rtol=2e-5, atol=2e-5
        )
        # the plan puts something in-range (non-degenerate fixture)
        cells = 64 * 64
        assert (ids < cells).sum() > 1000

        # W-matrix form (sum pool only): same canvas again
        if pool == "sum":
            from heal_tpu.utils.camera import frustum_splat_matrix_plan

            cellmap, dperm = frustum_splat_matrix_plan(
                rots, trans, intrins, post_rots, post_trans,
                dv, 128, 192, 16, gc, flat_plan=(ids, widx),
            )
            # flat keys globally sorted (the device scatter contract)
            pixs = cellmap.shape[0]
            keys = (
                cellmap.astype(np.int64)
                + np.arange(pixs, dtype=np.int64)[:, None] * (cells + 1)
            ).reshape(-1)
            assert (np.diff(keys) >= 0).all()
            with_mat = dict(
                base,
                splat_cell=jnp.asarray(cellmap)[None],
                splat_dperm=jnp.asarray(dperm)[None],
            )
            bev_mat, _ = enc.apply(var, with_mat, train=False)
            np.testing.assert_allclose(
                np.asarray(bev_dev), np.asarray(bev_mat),
                rtol=2e-5, atol=2e-5,
            )


class TestRealCameraIngest:
    """File-backed camera path: pngs + yaml calib -> packed LSS inputs."""

    def _make_tree(self, tmp_path):
        import json

        from heal_tpu.data.opv2v import (
            generate_modality_assignment,
            write_synthetic_opv2v_tree,
        )

        root = str(tmp_path / "opv2v")
        os.makedirs(root)
        write_synthetic_opv2v_tree(
            root, 1, 2, 2, num_vehicles=6, cameras=True, img_hw=(150, 200)
        )
        # deterministic: cav 0 -> m1 (lidar), cav 1 -> m2 (camera)
        assign = generate_modality_assignment(root, ("m1", "m2"), in_order=True)
        ap = str(tmp_path / "assign.json")
        with open(ap, "w") as f:
            json.dump(assign, f)
        return root, ap

    def _cfg(self, root, assignment_path):
        from heal_tpu.config import load_yaml

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_heter_m1m2.yaml"))
        cfg["fusion"]["dataset"] = "opv2v"
        cfg["root_dir"] = root
        cfg["test_dir"] = root
        cfg["heter"]["assignment_path"] = assignment_path
        cfg["heter"]["mapping_dict"] = {"m1": "m1", "m2": "m2"}
        return cfg

    def test_images_loaded_from_disk(self, tmp_path):
        from heal_tpu.data import build_dataset
        from heal_tpu.utils.camera import (
            img_transform,
            load_camera_images,
            normalize_img,
            sample_augmentation,
        )

        root, ap = self._make_tree(tmp_path)
        cfg = self._cfg(root, ap)
        ds = build_dataset(cfg, train=False)
        sample = ds[0]
        # slot 1 agent is camera -> packed into entry 0 of inputs_m2
        assert sample["slots_m2"][0] == 1
        imgs = sample["inputs_m2"]["imgs"]
        assert imgs.shape == (3, 4, 128, 192, 3)

        # eval aug policy is deterministic: packed image must equal the
        # directly-transformed png
        scen = sorted(os.listdir(root))[0]
        cavs = sorted(os.listdir(os.path.join(root, scen)))
        png = os.path.join(root, scen, cavs[1], "000000_camera0.png")
        raw = load_camera_images([png])[0]
        aug = cfg["heter"]["modality_setting"]["m2"]["data_aug_conf"]
        policy = sample_augmentation(aug, is_train=False)
        img_t, pr, pt = sample["inputs_m2"], None, None
        want, pr, pt = img_transform(raw, *policy[1:])
        np.testing.assert_allclose(
            imgs[0, 0], normalize_img(want), atol=1e-5
        )
        np.testing.assert_allclose(
            sample["inputs_m2"]["post_rots"][0, 0], pr, atol=1e-6
        )
        # depth supervision has real hits (bins < n_bins somewhere)
        bins = sample["inputs_m2"]["depth_bins"][0]
        assert (bins < 16).sum() > 10

    def test_calib_projects_lidar_into_image(self, tmp_path):
        """The written calib + loader roundtrip: points that produced
        bright pixels project back onto those pixels."""
        from heal_tpu.data.opv2v import OPV2VBackend

        root, ap = self._make_tree(tmp_path)
        cfg = self._cfg(root, ap)
        backend = OPV2VBackend(cfg, train=False)
        scene = backend.scene(0)
        cam_agent = scene["agents"][1]
        assert "cameras_raw" in cam_agent
        raw = cam_agent["cameras_raw"]
        pts = cam_agent["points"]
        rot, trans, K = raw["rots"][0], raw["trans"][0], raw["intrins"][0]
        cam_pts = (pts[:, :3] - trans) @ rot
        z = cam_pts[:, 2]
        sel = z > 0.5
        uv = cam_pts[sel] @ K.T
        u = (uv[:, 0] / uv[:, 2]).astype(int)
        v = (uv[:, 1] / uv[:, 2]).astype(int)
        ih, iw = raw["imgs"][0].shape[:2]
        ok = (u >= 0) & (u < iw) & (v >= 0) & (v < ih)
        assert ok.sum() > 50
        # splatted pixels carry the blue hit marker (background <= 70)
        hits = raw["imgs"][0][v[ok], u[ok], 2]
        assert (hits > 200).mean() > 0.9

    @pytest.mark.slow
    def test_train_step_on_real_images(self, tmp_path):
        import jax

        from heal_tpu.data import build_dataset
        from heal_tpu.losses import build_loss
        from heal_tpu.models import build_model
        from heal_tpu.parallel import Trainer
        from heal_tpu.parallel.schedulers import build_optimizer
        from heal_tpu.parallel.trainer import to_device

        root, ap = self._make_tree(tmp_path)
        cfg = self._cfg(root, ap)
        ds = build_dataset(cfg, train=True)
        model = build_model(cfg["model"])
        criterion = build_loss(cfg["loss"])
        tx = build_optimizer(cfg["optimizer"], cfg.get("lr_scheduler"), 4)
        trainer = Trainer(
            model=model, criterion=criterion, tx=tx, supervise_single=True
        ).compile()
        batch = to_device(next(ds.batches(2)))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        state, aux = trainer.train_step(state, batch)
        assert np.isfinite(float(aux["total_loss"]))
        assert np.isfinite(float(aux["depth_loss"]))


class TestHeterM1M2:
    @pytest.mark.slow
    def test_inference_reports_depth_rmse(self, tmp_path):
        """Camera-path inference reports depth RMSE alongside AP
        (VERDICT r4 item 7; ref tools/inference_utils.py:190)."""
        import jax

        from heal_tpu.config import load_yaml
        from heal_tpu.config.loader import save_yaml
        from heal_tpu.data import build_dataset
        from heal_tpu.models import build_model
        from heal_tpu.tools import checkpoint as ck
        from heal_tpu.tools.inference import run_inference

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_heter_m1m2.yaml"))
        cfg["fusion"]["args"]["num_agents"] = 2
        model_dir = str(tmp_path / "m1m2_run")
        os.makedirs(model_dir)
        save_yaml(cfg, os.path.join(model_dir, "config.yaml"))

        ds = build_dataset(cfg, train=False)
        model = build_model(cfg["model"])
        from heal_tpu.parallel.trainer import to_device

        batch = to_device(next(ds.batches(1, shuffle=False)))
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        ck.save_checkpoint(
            model_dir,
            {
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
            },
            1,
        )
        result = run_inference(model_dir, max_batches=2, note="m1m2")
        assert "depth_rmse_m2" in result, sorted(result)
        assert np.isfinite(result["depth_rmse_m2"])
        assert result["depth_rmse_m2"] >= 0

    @pytest.mark.slow
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
