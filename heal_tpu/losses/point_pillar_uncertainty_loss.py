"""Aleatoric-uncertainty detection loss (von Mises angle likelihood).

Capability parity with reference loss/point_pillar_uncertainty_loss.py +
utils/bessel_utils.py: the model predicts log-variances for position and
a von Mises concentration for yaw; regression terms become negative
log-likelihoods with learned heteroscedastic uncertainty.

The von Mises NLL needs log I0(kappa) (modified Bessel); we use the
numerically-stable large/small-argument split the reference's
bessel_utils implements via series — here via jax.scipy's i0e:
log I0(k) = log(i0e(k)) + k.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.registry import register_loss
from .point_pillar_loss import (
    PointPillarLoss,
    add_sin_difference,
    weighted_smooth_l1,
)


def log_i0(kappa):
    return jnp.log(jax.scipy.special.i0e(kappa)) + kappa


def von_mises_nll(pred_angle, target_angle, log_kappa):
    """-log VM(target; pred, kappa), kappa = exp(log_kappa)."""
    kappa = jnp.exp(log_kappa)
    return (
        -kappa * jnp.cos(pred_angle - target_angle)
        + log_i0(kappa)
        + jnp.log(2 * jnp.pi)
    )


@register_loss("point_pillar_uncertainty_loss")
class PointPillarUncertaintyLoss(PointPillarLoss):
    """Expects output_dict['unc_preds'] (B, H, W, A*3): log-var x, log-var
    y, log-kappa yaw (ref 'sm' head)."""

    def __init__(self, args: dict):
        super().__init__(args)
        self.unc_weight = args.get("uncertainty", {}).get("weight", 0.5)

    def __call__(self, output_dict, target_dict, suffix: str = ""):
        total, aux = super().__call__(output_dict, target_dict, suffix)
        key = f"unc_preds{suffix}"
        if key not in output_dict:
            return total, aux
        b = output_dict[f"cls_preds{suffix}"].shape[0]
        unc = output_dict[key].reshape(b, -1, 3)
        reg_preds = output_dict[f"reg_preds{suffix}"].reshape(b, -1, 7)
        reg_targets = target_dict["targets"].reshape(b, -1, 7)
        positives = target_dict["pos_equal_one"].reshape(b, -1) > 0
        pos_norm = jnp.maximum(
            positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0
        )
        w = positives.astype(jnp.float32) / pos_norm

        # heteroscedastic position NLL: |e| / exp(s) + s  (Laplace-style)
        err_xy = jnp.abs(reg_preds[..., :2] - reg_targets[..., :2])
        s_xy = unc[..., :2]
        nll_xy = (err_xy * jnp.exp(-s_xy) + s_xy).sum(-1)

        nll_yaw = von_mises_nll(
            reg_preds[..., 6], reg_targets[..., 6], unc[..., 2]
        )
        unc_loss = ((nll_xy + nll_yaw) * w).sum() / b * self.unc_weight
        total = total + unc_loss
        aux = dict(aux, unc_loss=unc_loss, total_loss=total)
        return total, aux
