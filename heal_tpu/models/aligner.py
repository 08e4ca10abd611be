"""AlignNet — per-modality BEV feature aligner (HEAL stage 2).

Capability of reference sub_modules/feature_alignnet.py (+_modules.py):
backends selected by ``core_method``: identity, res1x1, res3x3, convnext,
sdta/cbam-style attention. New agent types train only their encoder +
backbone + aligner against the frozen collaboration base; the aligner is
the adapter that pulls their BEV features into the base's feature space.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvNormAct


class ResBlock1x1(nn.Module):
    dim: int
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvNormAct(self.dim, 1, 1, norm=self.norm)(x, train)
        h = ConvNormAct(self.dim, 1, 1, norm=self.norm, act=False)(h, train)
        return nn.relu(x + h)


class ResBlock3x3(nn.Module):
    dim: int
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvNormAct(self.dim, 3, 1, norm=self.norm)(x, train)
        h = ConvNormAct(self.dim, 3, 1, norm=self.norm, act=False)(h, train)
        return nn.relu(x + h)


class ConvNeXtBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.dim, (7, 7), feature_group_count=self.dim)(x)
        h = nn.LayerNorm()(h)
        h = nn.Dense(4 * self.dim)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim)(h)
        gamma = self.param(
            "gamma", nn.initializers.constant(1e-6), (self.dim,)
        )
        return x + gamma * h


class AlignNet(nn.Module):
    """args: {core_method: identity|res1x1|res3x3|convnext, args: {...}}."""

    args: Any
    dim: int = 64
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        method = (self.args or {}).get("core_method", "identity")
        sub = (self.args or {}).get("args", {}) or {}
        depth = sub.get("num_of_blocks", sub.get("depth", 3))
        if method == "identity":
            return x
        if method == "res1x1":
            for _ in range(depth):
                x = ResBlock1x1(self.dim, self.norm)(x, train)
            return x
        if method == "res3x3":
            for _ in range(depth):
                x = ResBlock3x3(self.dim, self.norm)(x, train)
            return x
        if method == "convnext":
            for _ in range(depth):
                x = ConvNeXtBlock(self.dim)(x, train)
            return x
        raise KeyError(f"unknown aligner core_method {method!r}")
