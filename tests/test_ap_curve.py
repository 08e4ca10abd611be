"""AP-vs-epochs curve tool over a short CLI training run."""
import json
import os

import pytest

CFG = os.path.join(os.path.dirname(__file__), "configs", "tiny_intermediate.yaml")


@pytest.mark.slow
class TestApCurve:
    def test_curve_over_checkpoints(self, tmp_path):
        from heal_tpu.tools.ap_curve import list_epoch_checkpoints, run_curve
        from heal_tpu.tools.train import main as train_main

        run_dir = str(tmp_path / "run")
        train_main(
            ["-y", CFG, "--model_dir", run_dir, "--epochs", "2",
             "--no_final_inference"]
        )
        ckpts = list_epoch_checkpoints(run_dir)
        assert len(ckpts) >= 1
        # run dir reproducibility snapshot (ref train_utils.backup_script)
        assert os.path.isdir(os.path.join(run_dir, "scripts", "heal_tpu"))

        curve = run_curve(run_dir, max_batches=2)
        assert len(curve) == len(ckpts)
        assert all("epoch" in row for row in curve)
        ap_keys = [k for k in curve[0] if k.startswith("ap_")]
        assert ap_keys, curve[0]
        out = json.load(open(os.path.join(run_dir, "ap_curve.json")))
        assert out == curve
