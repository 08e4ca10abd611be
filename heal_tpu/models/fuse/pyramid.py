"""Pyramid Fusion — HEAL's collaboration base.

Capability parity with reference fuse_modules/pyramid_fuse.py: a ResNeXt
multiscale BEV backbone whose per-level features carry 1x1 "occupancy"
heads; collaborative fusion is a foreground-score softmax-weighted sum of
ego-warped per-agent features at every level, then the standard
deblock-decode. ``forward_single`` (stage-1/2 per-agent pass) returns the
decoded feature + per-level occ maps.

TPU-first: (B, L, H, W, C) padded agent tensors; weighted_fuse masks both
out-of-FOV pixels (warped score == 0 -> -inf, as the reference's
masked_fill) and padded agent slots before the agent-axis softmax.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.warp import warp_agents_to_ego
from ..resnet_bev import ResNetBEVBackbone

NEG_INF = -1e9


def weighted_fuse(
    features: jnp.ndarray,
    scores: jnp.ndarray,
    affine: jnp.ndarray,
    agent_mask: jnp.ndarray,
    align_corners: bool = False,
):
    """Softmax(score)-weighted sum of ego-warped features.

    features: (B, L, h, w, C); scores: (B, L, h, w, 1) in (0, 1];
    affine: (B, L, L, 2, 3) at this level's scale; agent_mask: (B, L).
    Mirrors pyramid_fuse.weighted_fuse(:17-63).
    """
    # one warp for features+score (concat on channels): halves the
    # per-agent warp-canvas overhead vs two separate calls
    cat = jnp.concatenate([features, scores.astype(features.dtype)], axis=-1)
    warped = warp_agents_to_ego(cat, affine, align_corners)
    warped_f, warped_s = warped[..., :-1], warped[..., -1:]
    # zeros mean "outside sender FOV" (scores are sigmoid + 1e-4 > 0 inside)
    logit = jnp.where(warped_s == 0.0, NEG_INF, warped_s)
    logit = jnp.where(agent_mask[:, :, None, None, None], logit, NEG_INF)
    weight = jax.nn.softmax(logit, axis=1)
    weight = jnp.where(jnp.isnan(weight), 0.0, weight)
    return (warped_f * weight).sum(axis=1)


class PyramidFusion(nn.Module):
    """args: fusion_backbone block of the config (resnext, layer_nums,
    layer_strides, num_filters, upsample_strides, num_upsample_filter)."""

    args: Any
    norm: str = "batch"

    def setup(self):
        a = self.args
        self.backbone = ResNetBEVBackbone(
            layer_nums=tuple(a["layer_nums"]),
            layer_strides=tuple(a["layer_strides"]),
            num_filters=tuple(a["num_filters"]),
            upsample_strides=tuple(a.get("upsample_strides", ())),
            num_upsample_filter=tuple(a.get("num_upsample_filter", ())),
            resnext=a.get("resnext", False),
            width_per_group=a.get("width_per_group", 4),
            norm=self.norm,
        )
        self.align_corners = a.get("align_corners", False)
        self.single_heads = [
            nn.Conv(1, (1, 1), name=f"single_head_{i}")
            for i in range(len(a["layer_nums"]))
        ]

    def forward_single(self, x, train: bool = False):
        """x: (N, H, W, C) -> (decoded (N, H, W, C'), occ list per level)."""
        feats = self.backbone.encode(x, train)
        occ_maps = [head(f) for head, f in zip(self.single_heads, feats)]
        return self.backbone.decode(feats, train), occ_maps

    def forward_collab(
        self,
        x: jnp.ndarray,
        affine: jnp.ndarray,
        agent_mask: jnp.ndarray,
        crop_mask_list: Sequence[jnp.ndarray] | None = None,
        train: bool = False,
    ):
        """x: (B, L, H, W, C) per-agent features; affine: (B, L, L, 2, 3).

        crop_mask_list: optional per-level (B, L, h, w, 1) multiplicative
        score masks (camera-FOV crop at inference; ref :147-162).
        Returns (fused (B, H, W, C'), occ_map list at (B*L, h, w, 1)).
        """
        b, l = x.shape[:2]
        feats = self.backbone.encode(x.reshape((b * l,) + x.shape[2:]), train)
        fused_levels = []
        occ_maps = []
        for i, f in enumerate(feats):
            occ = self.single_heads[i](f)  # (B*L, h, w, 1)
            occ_maps.append(occ)
            score = jax.nn.sigmoid(occ) + 1e-4
            if crop_mask_list is not None:
                score = score * crop_mask_list[i].reshape(score.shape)
            fl = f.reshape((b, l) + f.shape[1:])
            sl = score.reshape((b, l) + score.shape[1:])
            fused_levels.append(
                weighted_fuse(fl, sl, affine, agent_mask, self.align_corners)
            )
        return self.backbone.decode(fused_levels, train), occ_maps

    def __call__(self, x, train: bool = False):
        # default path (used for init): single forward
        return self.forward_single(x, train)
