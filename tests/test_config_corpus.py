"""Config corpus: every shipped YAML loads, derives its grid/anchor
params, and names a registered model + loss (one smoke per family)."""
import glob
import os

import pytest

from heal_tpu.config import load_yaml

CFG_ROOT = os.path.join(
    os.path.dirname(__file__), "..", "heal_tpu", "configs"
)
ALL_YAMLS = sorted(
    glob.glob(os.path.join(CFG_ROOT, "**", "*.yaml"), recursive=True)
)


class TestCorpus:
    def test_corpus_is_broad(self):
        rels = [os.path.relpath(p, CFG_ROOT) for p in ALL_YAMLS]
        for family in (
            "opv2v/lidar_only",
            "opv2v/camera_only",
            "opv2v/single",
            "opv2v/heal/stage1",
            "opv2v/heal/stage2",
            "opv2v/heal/final_infer",
            "opv2v/more_modality",
            "v2xset",
            "dairv2x",
            "v2xsim",
        ):
            assert any(r.startswith(family) for r in rels), family
        assert len(ALL_YAMLS) >= 38

    @pytest.mark.parametrize(
        "path", ALL_YAMLS, ids=[os.path.basename(p) for p in ALL_YAMLS]
    )
    def test_loads_and_derives(self, path):
        cfg = load_yaml(path)
        post = cfg["postprocess"]
        if post["core_method"] == "VoxelPostprocessor":
            aa = post["anchor_args"]
            assert aa["W"] > 0 and aa["H"] > 0  # derived by yaml_parser

    def test_models_and_losses_build(self):
        """Every config's model instantiates (module construction only —
        init/compile is covered by the family integration tests)."""
        from heal_tpu.losses import build_loss
        from heal_tpu.models import build_model

        for p in ALL_YAMLS:
            cfg = load_yaml(p)
            model = build_model(cfg["model"])
            assert model is not None, p
            criterion = build_loss(cfg["loss"])
            assert criterion is not None, p

    def test_exemplar_documents_every_family_key(self):
        cfg = load_yaml(os.path.join(CFG_ROOT, "exemplar.yaml"))
        for key in (
            "train_params", "comm_range", "heter", "fusion", "preprocess",
            "postprocess", "model", "loss", "optimizer", "lr_scheduler",
            "noise_setting", "box_align",
        ):
            assert key in cfg, key
        assert "modality_setting" in cfg["heter"]
