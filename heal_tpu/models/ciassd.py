"""CIA-SSD: single-stage detector with the SSFA neck + IoU-aware head.

Capability parity with reference models/ciassd.py +
sub_modules/cia_ssd_utils.py: MeanVFE + sparse 3D conv backbone
(our SECOND implicit-GEMM engine, models/second.py) -> height
compression -> Spatial-Semantic Feature Aggregation neck (two branches,
softmax-weighted merge) -> cls/reg/dir/IoU heads. The IoU head feeds the
confidence-rectification path and the FPV-RCNN first stage.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .heads import DetectionHeads
from .layers import ConvNormAct, DeconvNormAct
from .registry import register_model
from .second import SecondEncoder


class SSFA(nn.Module):
    """Spatial-Semantic Feature Aggregation (ref cia_ssd_utils.SSFA:6-59):
    a spatial branch at full stride and a semantic branch at 2x stride,
    merged by a learned per-pixel softmax weight."""

    features: int = 128
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        # bottom_up_block_0: 3x conv stride 1 (spatial branch)
        x0 = x
        for i in range(3):
            x0 = ConvNormAct(f, 3, 1, norm=self.norm, name=f"bu0_{i}")(
                x0, train
            )
        # bottom_up_block_1: 3x conv, first stride 2 (semantic branch)
        x1 = x0
        for i in range(3):
            x1 = ConvNormAct(
                2 * f, 3, 2 if i == 0 else 1, norm=self.norm,
                name=f"bu1_{i}",
            )(x1, train)
        t0 = ConvNormAct(f, 1, 1, norm=self.norm, name="trans_0")(x0, train)
        t1 = ConvNormAct(2 * f, 1, 1, norm=self.norm, name="trans_1")(
            x1, train
        )
        m0 = DeconvNormAct(f, 2, norm=self.norm, name="deconv_0")(t1, train)
        m0 = m0 + t0
        m1 = DeconvNormAct(f, 2, norm=self.norm, name="deconv_1")(t1, train)
        o0 = ConvNormAct(f, 3, 1, norm=self.norm, name="conv_0")(m0, train)
        o1 = ConvNormAct(f, 3, 1, norm=self.norm, name="conv_1")(m1, train)
        w0 = nn.Conv(1, (1, 1), name="w_0")(o0)
        w1 = nn.Conv(1, (1, 1), name="w_1")(o1)
        w = jax.nn.softmax(jnp.concatenate([w0, w1], axis=-1), axis=-1)
        return o0 * w[..., 0:1] + o1 * w[..., 1:2]


@register_model("ciassd")
class CIASSD(nn.Module):
    """args: voxel_size, lidar_range, second {channels, max_voxels},
    ssfa {feature_num}, anchor_number, dir_args."""

    args: Any

    @nn.compact
    def __call__(self, batch, train: bool = False):
        a = self.args
        norm = a.get("norm", "batch")
        enc = SecondEncoder(
            voxel_size=tuple(a["voxel_size"]),
            lidar_range=tuple(a["lidar_range"]),
            channels=tuple(a.get("second", {}).get(
                "channels", (16, 32, 64, 64)
            )),
            max_voxels=tuple(a.get("second", {}).get(
                "max_voxels", (24000, 16000, 12000, 8000)
            )),
            norm=norm,
        )
        points = batch["points"]
        mask = batch["point_mask"]
        if points.ndim == 4:  # (B, L, N, 4) agent-batched
            b, l = points.shape[:2]
            points = points.reshape((b * l,) + points.shape[2:])
            mask = mask.reshape((b * l,) + mask.shape[2:])
        bev = enc(points, mask, train)
        feat_num = a.get("ssfa", {}).get("feature_num", 128)
        bev = ConvNormAct(feat_num, 3, 1, norm=norm, name="input_proj")(
            bev, train
        )
        feat = SSFA(features=feat_num, norm=norm, name="ssfa")(bev, train)
        heads = DetectionHeads(
            anchor_number=a["anchor_number"],
            use_dir="dir_args" in a,
            num_bins=a.get("dir_args", {}).get("num_bins", 2),
            use_iou=True,  # the IoU-aware branch is CIA-SSD's point
            name="heads",
        )
        out = heads(feat)
        out["spatial_features_2d"] = feat
        return out
