"""Late-fusion end-to-end inference: per-agent forward -> project to ego
-> cross-agent NMS (ref tools/inference_utils.py:18-47), plus the
late-heter per-modality packing."""
import os

import numpy as np
import pytest

CFG_DIR = os.path.join(os.path.dirname(__file__), "configs")


class TestLateFuseMerge:
    def test_fuse_and_nms_dedups_cross_agent(self):
        """Two agents detect the same box -> one survivor; a distinct
        second box from agent 2 survives independently."""
        import jax.numpy as jnp

        from heal_tpu.postprocess.decode import fuse_and_nms, strip_padding
        from heal_tpu.utils.box_np import boxes_to_corners_3d

        box_a = np.array([[0.0, 0.0, 0.0, 1.56, 1.6, 3.9, 0.0]])
        box_b = np.array([[10.0, 5.0, 0.0, 1.56, 1.6, 3.9, 0.3]])
        ca = boxes_to_corners_3d(box_a, "hwl")
        cb = boxes_to_corners_3d(
            np.concatenate([box_a, box_b]), "hwl"
        )

        def pad(corners, scores, cap=8):
            c = np.zeros((cap, 8, 3), np.float32)
            s = np.zeros(cap, np.float32)
            v = np.zeros(cap, bool)
            c[: len(corners)] = corners
            s[: len(scores)] = scores
            v[: len(scores)] = True
            return jnp.asarray(c), jnp.asarray(s), jnp.asarray(v)

        c1, s1, v1 = pad(ca, [0.8])
        c2, s2, v2 = pad(cb, [0.9, 0.7])
        out = fuse_and_nms([c1, c2], [s1, s2], [v1, v2], max_det=16)
        dense = strip_padding({k: np.asarray(v) for k, v in out.items()})
        assert len(dense["scores"]) == 2
        # the duplicate kept the higher score
        np.testing.assert_allclose(sorted(dense["scores"]), [0.7, 0.9])


@pytest.mark.slow
class TestLateCLI:
    def test_train_then_late_inference(self, tmp_path):
        from heal_tpu.tools.inference import run_inference
        from heal_tpu.tools.train import main as train_main

        model_dir = str(tmp_path / "late_run")
        train_main(
            [
                "-y", os.path.join(CFG_DIR, "tiny_late.yaml"),
                "--model_dir", model_dir,
                "--epochs", "1",
                "--no_final_inference",
            ]
        )
        result = run_inference(model_dir, max_batches=3, note="late")
        assert "ap_50" in result
        assert os.path.exists(os.path.join(model_dir, "eval_late.yaml"))


class TestLateHeter:
    def test_heter_late_sample_and_forward(self):
        import jax

        from heal_tpu.config import load_yaml
        from heal_tpu.data import build_dataset
        from heal_tpu.data.scene import collate
        from heal_tpu.models import build_model

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_heter_m1m2.yaml"))
        cfg["fusion"]["core_method"] = "lateheter"
        cfg["model"]["core_method"] = "heter_model_late"
        cfg["model"]["args"]["in_head"] = 64
        ds = build_dataset(cfg, train=True)
        s = ds[0]
        # every modality key present + one-hot flags
        assert "inputs_m1" in s and "inputs_m2" in s
        assert s["modality_flags"].shape == (2,)
        assert s["modality_flags"].sum() == 1.0
        assert s["inputs_m1"]["points"].ndim == 2  # single-agent packing
        assert s["inputs_m2"]["imgs"].shape[0] == 4  # ncam leading

        model = build_model(cfg["model"])
        batch = jax.tree.map(
            lambda x: np.asarray(x), collate([ds[i] for i in range(2)])
        )
        import jax.numpy as jnp

        jbatch = jax.tree.map(jnp.asarray, batch)
        variables = model.init(jax.random.PRNGKey(0), jbatch, train=False)
        out = model.apply(variables, jbatch, train=False)
        assert np.isfinite(np.asarray(out["cls_preds"])).all()

    def test_modality_gating_blocks_inactive_branch(self):
        """A lidar-flagged sample's output must not change when the
        (inactive) camera inputs are replaced with noise."""
        import jax
        import jax.numpy as jnp

        from heal_tpu.config import load_yaml
        from heal_tpu.data import build_dataset
        from heal_tpu.data.scene import collate
        from heal_tpu.models import build_model

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_heter_m1m2.yaml"))
        cfg["fusion"]["core_method"] = "lateheter"
        cfg["model"]["core_method"] = "heter_model_late"
        ds = build_dataset(cfg, train=True)
        # find a lidar sample
        s = None
        for i in range(len(ds)):
            cand = ds[i]
            if cand["modality_flags"][0] == 1.0:
                s = cand
                break
        assert s is not None
        model = build_model(cfg["model"])
        batch = jax.tree.map(jnp.asarray, collate([s]))
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        out1 = model.apply(variables, batch, train=False)

        noisy = dict(batch)
        noisy["inputs_m2"] = dict(batch["inputs_m2"])
        noisy["inputs_m2"]["imgs"] = (
            batch["inputs_m2"]["imgs"]
            + jax.random.normal(
                jax.random.PRNGKey(1), batch["inputs_m2"]["imgs"].shape
            )
        )
        out2 = model.apply(variables, noisy, train=False)
        np.testing.assert_allclose(
            np.asarray(out1["cls_preds"]),
            np.asarray(out2["cls_preds"]),
            atol=1e-5,
        )


class TestLatePresortContract:
    def test_packed_points_are_pillar_sorted(self):
        """Every packing site must emit pillar-sorted points when presort
        is on: a presorted=True encoder treats ids as sorted and a
        violation silently corrupts the whole scatter (this exact bug
        produced AP 0.19 instead of ~0.9 on the single-agent demo)."""
        import numpy as np

        from heal_tpu.config import load_yaml
        from heal_tpu.data import build_dataset

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_late.yaml"))
        cfg["preprocess"]["args"]["presort"] = True
        for method in ("late", "early"):
            cfg["fusion"]["core_method"] = method
            ds = build_dataset(cfg, train=True)
            s = ds[0]
            pts = s["points"][s["point_mask"]]
            r = cfg["preprocess"]["cav_lidar_range"]
            vx, vy = cfg["preprocess"]["args"]["voxel_size"][:2]
            nx = int(round((r[3] - r[0]) / vx))
            xi = np.floor((pts[:, 0] - r[0]) / vx).astype(np.int64)
            yi = np.floor((pts[:, 1] - r[1]) / vy).astype(np.int64)
            ids = yi * nx + xi
            assert (np.diff(ids) >= 0).all(), f"{method}: unsorted points"
