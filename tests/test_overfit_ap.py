"""Overfit-AP regression: eval-mode detections must match train quality.

Guards the BatchNorm running-statistics bug class (momentum too slow ->
train-mode AP high, eval-mode AP zero).
"""
import os

import numpy as np

from heal_tpu.config import load_yaml

CFG_DIR = os.path.join(os.path.dirname(__file__), "configs")


class TestOverfitAP:
    def test_eval_mode_ap_after_overfit(self):
        import jax
        import jax.numpy as jnp
        import optax

        from heal_tpu.data import build_dataset
        from heal_tpu.losses import build_loss
        from heal_tpu.models import build_model
        from heal_tpu.parallel import Trainer
        from heal_tpu.parallel.trainer import to_device
        from heal_tpu.postprocess.decode import (
            post_process_single,
            strip_padding,
        )
        from heal_tpu.utils import box_np, eval_np

        cfg = load_yaml(os.path.join(CFG_DIR, "tiny_intermediate.yaml"))
        ds = build_dataset(cfg, train=True)
        model = build_model(cfg["model"])
        criterion = build_loss(cfg["loss"])
        trainer = Trainer(
            model=model, criterion=criterion, tx=optax.adam(2e-3)
        ).compile()
        batch = to_device(next(ds.batches(2, shuffle=False)))
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        for _ in range(150):
            state, aux = trainer.train_step(state, batch)
        assert float(aux["total_loss"]) < 2.0, float(aux["total_loss"])

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = model.apply(variables, batch, train=False)  # EVAL mode
        anchors = jnp.asarray(ds.anchors)
        stat = eval_np.new_result_stat((0.3,))
        for b in range(2):
            det = post_process_single(
                out["cls_preds"][b],
                out["reg_preds"][b],
                out["dir_preds"][b],
                anchors,
                jnp.eye(4),
                jnp.asarray(cfg["postprocess"]["gt_range"], jnp.float32),
                order="hwl",
                score_threshold=0.2,
                nms_threshold=0.15,
            )
            dense = strip_padding(jax.device_get(det))
            gt_mask = np.asarray(batch["gt_mask"][b]) > 0
            gtc = box_np.boxes_to_corners_3d(
                np.asarray(batch["gt_boxes"][b])[gt_mask], "hwl"
            )
            eval_np.calculate_tp_fp(
                dense["corners"], dense["scores"], gtc, stat, 0.3
            )
        ap, _, _ = eval_np.calculate_ap(stat, 0.3)
        assert ap > 0.5, f"eval-mode AP collapsed: {ap}"
