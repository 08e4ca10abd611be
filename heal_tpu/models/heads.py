"""Detection heads: 1x1 conv cls / reg / dir (NHWC).

Reference: the cls_head/reg_head/dir_head Conv2d(kernel=1) trio used by
every detector (e.g. models/heter_pyramid_collab.py:195-207).
Output layout is NHWC: cls (B, H, W, A), reg (B, H, W, A*7),
dir (B, H, W, A*num_bins) — matching heal_tpu.postprocess.decode.
"""
from __future__ import annotations

import flax.linen as nn


class DetectionHeads(nn.Module):
    anchor_number: int
    use_dir: bool = True
    num_bins: int = 2
    use_iou: bool = False  # IoU-quality branch (CoAlign configs)

    @nn.compact
    def __call__(self, x):
        out = {
            "cls_preds": nn.Conv(self.anchor_number, (1, 1), name="cls_head")(x),
            "reg_preds": nn.Conv(7 * self.anchor_number, (1, 1), name="reg_head")(
                x
            ),
        }
        if self.use_dir:
            out["dir_preds"] = nn.Conv(
                self.num_bins * self.anchor_number, (1, 1), name="dir_head"
            )(x)
        if self.use_iou:
            out["iou_preds"] = nn.Conv(
                self.anchor_number, (1, 1), name="iou_head"
            )(x)
        return out
