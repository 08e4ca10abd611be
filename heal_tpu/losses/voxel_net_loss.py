"""Faithful VoxelNet loss.

Semantics of reference ``loss/voxel_net_loss.py:12-62``: sigmoid
probability map split into positive / negative cross-entropy terms (each
normalized by its own anchor count + 1e-6), smooth-L1 regression summed
over positive-masked residuals and normalized by the positive count.
``total = reg_coe * reg + alpha * cls_pos + beta * cls_neg``.

Layout: NHWC — preds ``psm`` (B, H, W, A) logits + ``rm`` (B, H, W, A*7)
(the standard ``cls_preds`` / ``reg_preds`` head keys are accepted too);
targets are the anchor-assignment dict of
``postprocess.targets.generate_targets`` — the same ``pos_equal_one`` /
``neg_equal_one`` / ``targets`` names the reference consumes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.registry import register_loss
from .pixor_loss import _smooth_l1


@register_loss("voxel_net_loss")
class VoxelNetLoss:
    """args: alpha, beta (pos/neg cls weights), reg (reg_coe)."""

    def __init__(self, args: dict):
        self.alpha = args["alpha"]
        self.beta = args["beta"]
        self.reg_coe = args["reg"]

    def __call__(self, output_dict, target_dict, suffix: str = ""):
        psm = output_dict.get(
            f"psm{suffix}", output_dict.get(f"cls_preds{suffix}")
        )
        rm = output_dict.get(
            f"rm{suffix}", output_dict.get(f"reg_preds{suffix}")
        )
        pos = target_dict["pos_equal_one"].astype(jnp.float32)  # (B,H,W,A)
        neg = target_dict["neg_equal_one"].astype(jnp.float32)
        targets = target_dict["targets"]  # (B, H, W, A*7)

        p_pos = jax.nn.sigmoid(psm.astype(jnp.float32))
        rm = rm.reshape(rm.shape[:3] + (-1, 7)).astype(jnp.float32)
        tgt = targets.reshape(targets.shape[:3] + (-1, 7)).astype(
            jnp.float32
        )
        pos5 = pos[..., None]

        cls_pos_loss = -(pos * jnp.log(p_pos + 1e-6)).sum() / (
            pos.sum() + 1e-6
        )
        cls_neg_loss = -(neg * jnp.log(1.0 - p_pos + 1e-6)).sum() / (
            neg.sum() + 1e-6
        )
        reg_loss = _smooth_l1(rm * pos5, tgt * pos5).sum() / (
            pos.sum() + 1e-6
        )
        conf_loss = self.alpha * cls_pos_loss + self.beta * cls_neg_loss
        total = self.reg_coe * reg_loss + conf_loss
        return total, {
            "total_loss": total,
            "reg_loss": reg_loss,
            "conf_loss": conf_loss,
        }
