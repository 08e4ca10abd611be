"""Shared flax building blocks (NHWC).

Conv/Norm/ReLU stacks, transposed-conv upsampling, and the ResNet basic /
bottleneck blocks used across BEV backbones (capability of reference
sub_modules/resblock.py, base_bev_backbone*.py, downsample_conv.py).

Norm policy: ``norm`` ∈ {"batch", "group", "none"}. "batch" mirrors the
reference's BatchNorm2d(eps=1e-3, momentum=0.01) and uses flax mutable
``batch_stats``; "group" is the TPU-native default elsewhere in this repo —
stateless, no cross-replica stat syncing under pjit.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


# Default BatchNorm momentum. torch's 0.1 ~= flax 0.9; the reference uses
# torch-0.01 (flax 0.99), which needs tens of thousands of steps for
# running stats to converge — eval-mode predictions are garbage on shorter
# runs (found via overfit-AP: train-mode AP 0.83, eval-mode 0.0). 0.9 is
# the default; set ``model.args.bn_momentum: 0.99`` for reference parity
# on long schedules (build_model applies it globally).
_BN_MOMENTUM = 0.9


def set_default_bn_momentum(momentum: float):
    global _BN_MOMENTUM
    _BN_MOMENTUM = float(momentum)


def default_bn_momentum() -> float:
    return _BN_MOMENTUM


class Norm(nn.Module):
    kind: str = "batch"
    momentum: float | None = None  # None -> the global default

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=(
                    self.momentum
                    if self.momentum is not None
                    else _BN_MOMENTUM
                ),
                epsilon=1e-3,
            )(x)
        if self.kind == "group":
            groups = min(32, x.shape[-1])
            while x.shape[-1] % groups != 0:
                groups //= 2
            return nn.GroupNorm(num_groups=groups, epsilon=1e-3)(x)
        if self.kind == "none":
            return x
        raise ValueError(f"unknown norm kind {self.kind!r}")


class ConvNormAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: str | int = "SAME"
    groups: int = 1
    norm: str = "batch"
    act: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding if isinstance(self.padding, str) else [
            (self.padding, self.padding)
        ] * 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
        )(x)
        x = Norm(self.norm)(x, train)
        return nn.relu(x) if self.act else x


class DeconvNormAct(nn.Module):
    """Transposed-conv upsample + norm + relu (reference deblocks)."""

    features: int
    stride: int
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride >= 1:
            x = nn.ConvTranspose(
                self.features,
                (self.stride, self.stride),
                strides=(self.stride, self.stride),
                use_bias=False,
            )(x)
        else:
            s = int(round(1 / self.stride))
            x = nn.Conv(
                self.features, (s, s), strides=(s, s), use_bias=False
            )(x)
        x = Norm(self.norm)(x, train)
        return nn.relu(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    groups: int = 1  # ResNeXt-style grouped conv (pyramid fusion)
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvNormAct(
            self.planes, 3, self.stride, groups=self.groups, norm=self.norm
        )(x, train)
        out = ConvNormAct(
            self.planes, 3, 1, groups=self.groups, norm=self.norm, act=False
        )(out, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = ConvNormAct(
                self.planes, 1, self.stride, norm=self.norm, act=False
            )(x, train)
        return nn.relu(out + identity)


class BottleneckX(nn.Module):
    """Bottleneck block with expansion 1 (capability of PyramidFusion's
    ResNeXt blocks, pyramid_fuse.py:72-79).

    TPU-first deviation: the reference uses groups=32 / width_per_group=4;
    4-channel groups map to 4-wide matmuls on the 128x128 MXU (<1%
    utilization — measured 30x slowdown on TPU v5e). We run the 3x3 dense
    at the same width (>= the grouped capacity, MXU-aligned). Set
    ``groups`` > 1 only if you really want grouped convs.
    """

    planes: int
    stride: int = 1
    groups: int = 1
    width_per_group: int = 4
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.width_per_group / 64.0)) * 32
        identity = x
        out = ConvNormAct(width, 1, 1, norm=self.norm)(x, train)
        out = ConvNormAct(
            width, 3, self.stride, groups=self.groups, norm=self.norm
        )(out, train)
        out = ConvNormAct(self.planes, 1, 1, norm=self.norm, act=False)(
            out, train
        )
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = ConvNormAct(
                self.planes, 1, self.stride, norm=self.norm, act=False
            )(x, train)
        return nn.relu(out + identity)


class ResNetStage(nn.Module):
    """A stage of `blocks` BasicBlocks, stride on the first."""

    planes: int
    blocks: int
    stride: int = 1
    groups: int = 1
    norm: str = "batch"
    bottleneck_x: bool = False
    width_per_group: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.blocks):
            stride = self.stride if i == 0 else 1
            if self.bottleneck_x:
                x = BottleneckX(
                    self.planes,
                    stride=stride,
                    width_per_group=self.width_per_group,
                    norm=self.norm,
                )(x, train)
            else:
                x = BasicBlock(
                    self.planes, stride=stride, groups=self.groups, norm=self.norm
                )(x, train)
        return x


class DownsampleConv(nn.Module):
    """Shrink header: stacked conv-norm-relu (ref sub_modules/downsample_conv.py).

    Config lists kernal_size/stride/padding/dim per stage.
    """

    dims: Sequence[int]
    kernels: Sequence[int]
    strides: Sequence[int]
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        for dim, k, s in zip(self.dims, self.kernels, self.strides):
            x = ConvNormAct(dim, k, s, norm=self.norm)(x, train)
        return x


class AutoEncoder(nn.Module):
    """Spatial+channel autoencoder compressor
    (ref sub_modules/auto_encoder.py): layer_num encoder stages each
    halving H/W (stride-2 conv) AND channels, mirrored transposed-conv
    decoder stages restoring both."""

    feature_num: int
    layer_num: int = 1
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.feature_num
        for i in range(self.layer_num):
            x = ConvNormAct(c, 3, 2, norm=self.norm, name=f"enc_{i}a")(
                x, train
            )
            x = ConvNormAct(
                c // 2, 3, 1, norm=self.norm, name=f"enc_{i}b"
            )(x, train)
            c //= 2
        for i in range(self.layer_num - 1, -1, -1):
            x = DeconvNormAct(
                2 * c, 2, norm=self.norm, name=f"dec_{i}a"
            )(x, train)
            x = ConvNormAct(
                2 * c, 3, 1, norm=self.norm, name=f"dec_{i}b"
            )(x, train)
            c *= 2
        return x


class NaiveCompressor(nn.Module):
    """Channel autoencoder for bandwidth compression
    (ref sub_modules/naive_compress.py)."""

    input_dim: int
    compress_ratio: int
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.input_dim // self.compress_ratio
        x = ConvNormAct(hidden, 3, 1, norm=self.norm)(x, train)
        x = ConvNormAct(self.input_dim, 3, 1, norm=self.norm)(x, train)
        x = ConvNormAct(self.input_dim, 3, 1, norm=self.norm)(x, train)
        return x
