"""HEAL 3-stage open-heterogeneity protocol, end to end.

Stage 1: train the m1 collaboration base.
Stage 2: train m2 with pyramid/shrink/heads FROZEN at stage-1 values.
Stage 3: merge checkpoints (pytree union, base wins on shared modules).
Infer:   the merged m1+m2 collab model runs inference.
"""
import os

import numpy as np
import pytest

CFG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def flat_leaves(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(flat_leaves(v, p))
        else:
            out[p] = np.asarray(v)
    return out


@pytest.mark.slow
class TestHealProtocol:
    def test_three_stages(self, tmp_path):
        from heal_tpu.tools import checkpoint as ck
        from heal_tpu.tools.merge import merge_final
        from heal_tpu.tools.train import main as train_main

        stage1 = str(tmp_path / "stage1")
        stage2 = str(tmp_path / "stage2")
        merged = str(tmp_path / "merged")

        # ---- stage 1: m1 collaboration base
        train_main(
            [
                "-y", os.path.join(CFG_DIR, "entry_tiny.yaml"),
                "--model_dir", stage1,
                "--epochs", "1",
                "--no_final_inference",
            ]
        )
        _, s1_path = ck.find_checkpoint(stage1)
        s1 = ck.load_checkpoint(s1_path)
        assert "branch_m1" in s1["params"]
        assert "pyramid_backbone" in s1["params"]

        # ---- stage 2: m2 single, base frozen + initialized from stage 1
        train_main(
            [
                "-y", os.path.join(CFG_DIR, "entry_m2_single.yaml"),
                "--model_dir", stage2,
                "--epochs", "1",
                "--no_final_inference",
                "--init_from", s1_path,
            ]
        )
        _, s2_path = ck.find_checkpoint(stage2)
        s2 = ck.load_checkpoint(s2_path)
        assert "branch_m2" in s2["params"]
        # frozen modules stayed EXACTLY at stage-1 values
        f1 = flat_leaves(s1["params"]["pyramid_backbone"])
        f2 = flat_leaves(s2["params"]["pyramid_backbone"])
        assert f1.keys() == f2.keys()
        for k in f1:
            np.testing.assert_array_equal(f1[k], f2[k], err_msg=k)
        # frozen BN running stats must not drift either (reference fix_bn:
        # frozen modules run in eval mode during stage-2 training)
        for mod in ("pyramid_backbone", "shrink"):
            if mod not in s1.get("batch_stats", {}):
                continue
            b1 = flat_leaves(s1["batch_stats"][mod])
            b2 = flat_leaves(s2["batch_stats"][mod])
            assert b1.keys() == b2.keys()
            for k in b1:
                np.testing.assert_array_equal(b1[k], b2[k], err_msg=k)
        # while the m2 branch actually trained (params differ from init
        # is implied by finite loss + optimizer steps; check non-zero grads
        # happened by comparing to a fresh init is overkill here)

        # ---- stage 3: merge
        merge_final([stage2], stage1, merged)
        m = ck.load_checkpoint(os.path.join(
            merged, "net_epoch_bestval_at0.ckpt"
        ))
        assert "branch_m1" in m["params"] and "branch_m2" in m["params"]
        fm = flat_leaves(m["params"]["pyramid_backbone"])
        for k in f1:
            np.testing.assert_array_equal(f1[k], fm[k], err_msg=k)

        # ---- final inference with the merged heterogeneous model
        import shutil

        from heal_tpu.config import load_yaml, save_yaml
        from heal_tpu.tools.inference import run_inference

        final_cfg = load_yaml(
            os.path.join(CFG_DIR, "entry_m1m2_final.yaml")
        )
        save_yaml(final_cfg, os.path.join(merged, "config.yaml"))
        result = run_inference(merged, max_batches=2)
        assert "ap_50" in result

    def test_four_modality_protocol(self, tmp_path):
        """Tiny twin of the FLAGSHIP demo (configs/demo_heal_full/):
        stage-2 SECOND (m3) and 16-line-pillars (m4) branches trained
        against the frozen m1 base, three-way merge, and merged
        m1+m2+m3+m4 alliance inference (ref hypes_yaml/opv2v/HEAL +
        inference_heter_in_order protocol)."""
        from heal_tpu.config import load_yaml, save_yaml
        from heal_tpu.tools import checkpoint as ck
        from heal_tpu.tools.inference import run_inference
        from heal_tpu.tools.merge import merge_final
        from heal_tpu.tools.train import main as train_main

        stage1 = str(tmp_path / "stage1")
        train_main(
            ["-y", os.path.join(CFG_DIR, "entry_tiny.yaml"),
             "--model_dir", stage1, "--epochs", "1",
             "--no_final_inference"]
        )
        _, s1_path = ck.find_checkpoint(stage1)
        s1 = ck.load_checkpoint(s1_path)

        stage_dirs = []
        for m in ("m2", "m3", "m4"):
            d = str(tmp_path / f"stage2_{m}")
            train_main(
                ["-y", os.path.join(CFG_DIR, f"entry_{m}_single.yaml"),
                 "--model_dir", d, "--epochs", "1",
                 "--no_final_inference", "--init_from", s1_path]
            )
            _, sp = ck.find_checkpoint(d)
            s = ck.load_checkpoint(sp)
            assert f"branch_{m}" in s["params"], m
            # base stayed frozen in every stage-2 leg
            f1 = flat_leaves(s1["params"]["pyramid_backbone"])
            f2 = flat_leaves(s["params"]["pyramid_backbone"])
            for k in f1:
                np.testing.assert_array_equal(f1[k], f2[k], err_msg=k)
            stage_dirs.append(d)

        merged = str(tmp_path / "merged4")
        merge_final(stage_dirs, stage1, merged)
        m = ck.load_checkpoint(
            os.path.join(merged, "net_epoch_bestval_at0.ckpt")
        )
        for b in ("branch_m1", "branch_m2", "branch_m3", "branch_m4"):
            assert b in m["params"], b

        final_cfg = load_yaml(
            os.path.join(CFG_DIR, "entry_m1m2m3m4_final.yaml")
        )
        save_yaml(final_cfg, os.path.join(merged, "config.yaml"))
        result = run_inference(merged, max_batches=2)
        assert "ap_50" in result
