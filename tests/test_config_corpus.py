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
            "v2xset/single",
            "v2xset/lidar_only",
            "v2xset/camera_only",
            "v2xset/heal/stage1",
            "v2xset/heal/stage2",
            "v2xset/heal/final_infer",
            "dairv2x/single",
            "dairv2x/lidar_only",
            "dairv2x/camera_only",
            "dairv2x/more_modality",
            "dairv2x/heal/stage2",
            "dairv2x/heal/final_infer",
            "v2xsim/single",
            "v2xsim/lidar_only",
        ):
            assert any(r.startswith(family) for r in rels), family
        # full reference breadth: hypes_yaml ships 106 experiment yamls
        assert len(ALL_YAMLS) >= 106, len(ALL_YAMLS)

    def test_assignment_jsons_shipped(self):
        """modality_assign maps (ref modality_assign/: random + in_order
        per dataset) ship with the corpus and follow the protocol rules."""
        import json

        d = os.path.join(CFG_ROOT, "modality_assign")
        for name in (
            "opv2v_4modality.json",
            "opv2v_4modality_in_order.json",
            "v2xset_4modality.json",
            "v2xset_4modality_in_order.json",
        ):
            with open(os.path.join(d, name)) as f:
                m = json.load(f)
            assert len(m) > 0
            for scen, cavs in m.items():
                mods = list(cavs.values())
                assert all(v in ("m1", "m2", "m3", "m4") for v in mods)
                if "in_order" in name:
                    # protocol: k-th agent gets m(k%4+1)
                    want = [f"m{k % 4 + 1}" for k in range(len(mods))]
                    got = [
                        cavs[c]
                        for c in sorted(
                            cavs,
                            key=lambda c: (c == "-1", str(c)),
                        )
                    ]
                    assert got == want, (name, scen)

    def test_assignment_resolves_from_config_path(self):
        """The relative assignment_path written into shipped configs
        resolves against the packaged configs dir."""
        from heal_tpu.data.opv2v import Adaptor

        heter = {
            "modality_setting": {"m1": {}, "m2": {}},
            "assignment_path": "modality_assign/opv2v_4modality.json",
        }
        ad = Adaptor(heter, train=False)
        assert len(ad.assignment) >= 60

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
