"""Faithful PIXOR loss.

Semantics of reference ``loss/pixor_loss.py:13-66``: unweighted mean
binary-cross-entropy over every pixel of the objectness map (the
reference computes class-balance weights but does not apply them — the
weighted call is commented out), plus a smooth-L1 regression loss on the
cls-masked 6-channel regression map, sum-reduced and divided by the
positive-pixel count. ``total = alpha * cls + beta * loc``.

Layout: NHWC — preds ``cls`` (B, H, W, 1) logits + ``reg`` (B, H, W, 6);
target ``label_map`` (B, H, W, 7) from
``postprocess.targets.generate_pixor_label_map`` (channel 0 objectness,
1-6 normalized regression). The reference's NCHW split([1, 6], dim=1) is
the same math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.registry import register_loss


def _bce_with_logits(logits, labels):
    """Numerically-stable elementwise BCE (torch F.binary_cross_entropy_
    with_logits semantics)."""
    return (
        jnp.clip(logits, 0, None)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def _smooth_l1(x, y):
    """torch F.smooth_l1_loss default beta=1: 0.5 d^2 if |d|<1 else |d|-0.5."""
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


@register_loss("pixor_loss")
class PixorLoss:
    """args: alpha (cls weight), beta (reg weight)."""

    def __init__(self, args: dict):
        self.alpha = args["alpha"]
        self.beta = args["beta"]

    def __call__(self, output_dict, target_dict, suffix: str = ""):
        targets = target_dict["label_map"]  # (B, H, W, 7)
        cls_preds = output_dict.get(
            f"cls{suffix}", output_dict.get(f"cls_preds{suffix}")
        )
        loc_preds = output_dict.get(
            f"reg{suffix}", output_dict.get(f"reg_preds{suffix}")
        )
        cls_targets = targets[..., :1]
        loc_targets = targets[..., 1:]

        cls_loss = jnp.mean(
            _bce_with_logits(cls_preds, cls_targets.astype(cls_preds.dtype))
        )

        pos_pixels = cls_targets.sum()
        loc_sum = _smooth_l1(
            cls_targets * loc_preds, cls_targets * loc_targets
        ).sum()
        # ref :57-58: divide by positives only when there are any
        loc_loss = jnp.where(pos_pixels > 0, loc_sum / pos_pixels, loc_sum)

        total = self.alpha * cls_loss + self.beta * loc_loss
        return total, {
            "total_loss": total,
            "cls_loss": cls_loss,
            "reg_loss": loc_loss,
        }
