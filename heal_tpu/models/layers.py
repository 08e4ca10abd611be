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
import jax
import jax.numpy as jnp


# Default BatchNorm momentum. torch's 0.1 ~= flax 0.9; the reference uses
# torch-0.01 (flax 0.99), which needs tens of thousands of steps for
# running stats to converge — eval-mode predictions are garbage on shorter
# runs (found via overfit-AP: train-mode AP 0.83, eval-mode 0.0). 0.9 is
# the default; set ``model.args.bn_momentum: 0.99`` for reference parity
# on long schedules. A non-default momentum rides the norm-kind string as
# "batch@0.99" (build_model rewrites args['norm']) so each model instance
# carries its own value — no process-global state; a KD teacher and
# student can use different momenta in one process.
DEFAULT_BN_MOMENTUM = 0.9


def parse_norm(kind: str) -> tuple[str, float | None]:
    """Split a norm-kind string into (base kind, momentum override).

    "batch" -> ("batch", None); "batch@0.99" -> ("batch", 0.99).
    """
    if "@" in kind:
        base, mom = kind.split("@", 1)
        return base, float(mom)
    return kind, None


class Norm(nn.Module):
    kind: str = "batch"
    momentum: float | None = None  # None -> the default
    # the reference mixes eps conventions: torch-default 1e-5 inside
    # resblocks (resblock.py uses bare nn.BatchNorm2d), 1e-3 in deblocks
    # and the VFE (base_bev_backbone_resnet.py:60); match per call site
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool = False, tile: int = 1):
        """tile > 1: x carries `tile` width-phases packed into channels
        (see pack_width); the (C,) norm params apply per logical channel."""
        kind, kind_momentum = parse_norm(self.kind)
        if kind == "batch":
            c = x.shape[-1] // tile
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            ra_mean = self.variable(
                "batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32)
            )
            ra_var = self.variable(
                "batch_stats", "var", lambda: jnp.ones(c, jnp.float32)
            )
            if train:
                assert tile == 1, "packed layout is eval-only"
                xf = x.astype(jnp.float32)
                axes = tuple(range(x.ndim - 1))
                m = jnp.mean(xf, axis=axes)
                v = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(m)
                mom = self.momentum
                if mom is None:
                    mom = kind_momentum
                if mom is None:
                    mom = DEFAULT_BN_MOMENTUM
                if not self.is_initializing():
                    ra_mean.value = mom * ra_mean.value + (1 - mom) * m
                    ra_var.value = mom * ra_var.value + (1 - mom) * v
            else:
                m, v = ra_mean.value, ra_var.value
            mul = scale * jax.lax.rsqrt(
                v.astype(scale.dtype) + self.epsilon
            )
            add = bias - m.astype(scale.dtype) * mul
            if tile > 1:
                mul = jnp.tile(mul, tile)
                add = jnp.tile(add, tile)
            return (x * mul + add).astype(x.dtype)
        if kind == "group":
            assert tile == 1, "group norm is not packed-layout aware"
            groups = min(32, x.shape[-1])
            while x.shape[-1] % groups != 0:
                groups //= 2
            return nn.GroupNorm(num_groups=groups, epsilon=1e-3)(x)
        if kind == "none":
            return x
        raise ValueError(f"unknown norm kind {self.kind!r}")


def pack_width(x):
    """(N, H, W, C) -> (N, H, W/2, 2C): adjacent column pairs packed into
    channels (channel p*C + c holds column phase p). 64-channel BEV convs
    run ~6x under MXU peak on v5e (half-empty lanes); packed at 128
    channels the same math runs at full tile occupancy."""
    n, h, w, c = x.shape
    return x.reshape(n, h, w // 2, 2 * c)


def unpack_width(x):
    n, h, wb, c2 = x.shape
    return x.reshape(n, h, wb * 2, c2 // 2)


def s2d_conv_kernel(k, stride: int):
    """Transform an HWIO conv kernel to operate on width-packed layout.

    Returns (k2 (kh, bw, 2*cin, 2*cout), w_pad (lo, hi)) such that a
    conv_general_dilated over the packed input with stride
    (stride, stride) and width padding w_pad equals the original conv
    with torch-style symmetric padding (kw-1)//2 (even H, W), with the
    output again width-packed.
    """
    kh, kw, cin, cout = k.shape
    pad_low = (kw - 1) // 2  # torch symmetric padding convention
    taps = []
    for p in (0, 1):
        for v in range(kw):
            t = stride * p + v - pad_low
            taps.append((t // 2, t % 2, p, v))
    bo_min = min(t[0] for t in taps)
    bo_max = max(t[0] for t in taps)
    bw = bo_max - bo_min + 1
    k2 = jnp.zeros((kh, bw, 2 * cin, 2 * cout), k.dtype)
    for bo, pi, p, v in taps:
        k2 = k2.at[
            :,
            bo - bo_min,
            pi * cin : (pi + 1) * cin,
            p * cout : (p + 1) * cout,
        ].add(k[:, v])
    # width padding on the block axis: cover block index range used by
    # the first/last output block
    if stride == 1:
        w_pad = (-bo_min, bo_max)
    else:
        w_pad = (max(-bo_min, 0), max(bo_max - 1, 0))
    return k2, w_pad


class ConvNormAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: str | int = "SAME"
    groups: int = 1
    norm: str = "batch"
    act: bool = True
    use_bias: bool = False
    norm_eps: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool = False, s2d: bool = False):
        cin = x.shape[-1] // (2 if s2d else 1)
        kern = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, cin // self.groups, self.features),
        )
        kern = kern.astype(x.dtype)
        if s2d:
            assert self.groups == 1 and self.padding == "SAME"
            k2, w_pad = s2d_conv_kernel(kern, self.stride)
            h_pad = (((self.kernel - 1) // 2,) * 2)
            x = jax.lax.conv_general_dilated(
                x,
                k2,
                (self.stride, self.stride),
                [h_pad, w_pad],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            # "SAME" means torch-style symmetric padding (k-1)//2: for
            # stride 1 and odd kernels it IS XLA SAME; for strided convs
            # XLA SAME pads asymmetrically ((0, 1) for 3x3/s2), which
            # shifts features one pixel vs the reference's convention and
            # breaks checkpoint transplants (utils/transplant.py)
            if isinstance(self.padding, str):
                p = (self.kernel - 1) // 2
            else:
                p = self.padding
            x = jax.lax.conv_general_dilated(
                x,
                kern,
                (self.stride, self.stride),
                [(p, p)] * 2,
                feature_group_count=self.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            b = self.param(
                "conv_bias", nn.initializers.zeros, (self.features,)
            ).astype(x.dtype)
            x = x + (jnp.tile(b, 2) if s2d else b)
        x = Norm(self.norm, epsilon=self.norm_eps)(
            x, train, tile=2 if s2d else 1
        )
        return nn.relu(x) if self.act else x


class DeconvNormAct(nn.Module):
    """Transposed-conv upsample + norm + relu (reference deblocks).

    kernel == stride (the only configuration the deblocks use), so the
    transposed conv is computed as ONE 1x1 GEMM producing s*s*C channels
    followed by a depth-to-space reshape — mathematically identical
    (each output pixel receives exactly one kernel tap when the windows
    don't overlap), but ~20x fewer "ops" for XLA than the input-dilated
    convolution lowering of ConvTranspose, which measured ~2 ms/frame
    for 3.7 GFLOP of deblocks at bench scale on v5e. The parameter keeps
    nn.ConvTranspose's (kh, kw, I, O) shape/name so checkpoints and the
    reference transplant (utils/transplant.deconv_kernel) are unchanged.
    """

    features: int
    stride: int
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride >= 1:
            # explicit name keeps the param at ["ConvTranspose_0"]
            # ["kernel"] — checkpoints/transplants unchanged
            x = _PixelShuffleDeconv(
                features=self.features, stride=self.stride,
                name="ConvTranspose_0",
            )(x)
        else:
            s = int(round(1 / self.stride))
            x = nn.Conv(
                self.features, (s, s), strides=(s, s), use_bias=False
            )(x)
        x = Norm(self.norm)(x, train)
        return nn.relu(x)


class _PixelShuffleDeconv(nn.Module):
    """kernel==stride ConvTranspose as 1x1 GEMM + depth-to-space.

    Parameter shape/name matches nn.ConvTranspose ((kh, kw, I, O) under
    "kernel"); the module registers under the caller's usual
    "ConvTranspose_0" slot via the explicit name in DeconvNormAct, so
    checkpoints and transplants load unchanged. flax ConvTranspose's
    tap at output (i*s+di, j*s+dj) is kern[s-1-di, s-1-dj] (spatially
    flipped — probed directly); the depth-to-space arrangement below
    reproduces it exactly
    (tests/test_zoo_variants.py::test_pixel_shuffle_deconv_exact).
    """

    features: int
    stride: int

    @nn.compact
    def __call__(self, x):
        s = self.stride
        cin = x.shape[-1]
        kern = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (s, s, cin, self.features),
        )
        if s == 1:
            return jnp.dot(
                x, kern[0, 0].astype(x.dtype),
                preferred_element_type=x.dtype,
            )
        w = (
            kern[::-1, ::-1].astype(x.dtype)
            .transpose(2, 0, 1, 3)
            .reshape(cin, s * s * self.features)
        )
        n, h, ww = x.shape[:3]
        y = jnp.dot(
            x.reshape(-1, cin), w, preferred_element_type=x.dtype
        ).reshape(n, h, ww, s, s, self.features)
        # depth-to-space: (n, h, w, s, s, C) -> (n, h*s, w*s, C)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, h * s, ww * s, self.features
        )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    groups: int = 1  # ResNeXt-style grouped conv (pyramid fusion)
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False, s2d: bool = False):
        cin = x.shape[-1] // (2 if s2d else 1)
        identity = x
        # eps 1e-5: the reference resblocks use bare nn.BatchNorm2d
        out = ConvNormAct(
            self.planes, 3, self.stride, groups=self.groups,
            norm=self.norm, norm_eps=1e-5,
        )(x, train, s2d=s2d)
        out = ConvNormAct(
            self.planes, 3, 1, groups=self.groups, norm=self.norm,
            act=False, norm_eps=1e-5,
        )(out, train, s2d=s2d)
        if self.stride != 1 or cin != self.planes:
            identity = ConvNormAct(
                self.planes, 1, self.stride, norm=self.norm, act=False,
                norm_eps=1e-5,
            )(x, train, s2d=s2d)
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
    def __call__(self, x, train: bool = False, s2d: bool = False):
        width = int(self.planes * (self.width_per_group / 64.0)) * 32
        cin = x.shape[-1] // (2 if s2d else 1)
        identity = x
        out = ConvNormAct(width, 1, 1, norm=self.norm, norm_eps=1e-5)(
            x, train, s2d=s2d
        )
        out = ConvNormAct(
            width, 3, self.stride, groups=self.groups, norm=self.norm,
            norm_eps=1e-5,
        )(out, train, s2d=s2d)
        out = ConvNormAct(
            self.planes, 1, 1, norm=self.norm, act=False, norm_eps=1e-5
        )(out, train, s2d=s2d)
        if self.stride != 1 or cin != self.planes:
            identity = ConvNormAct(
                self.planes, 1, self.stride, norm=self.norm, act=False,
                norm_eps=1e-5,
            )(x, train, s2d=s2d)
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
        import os

        # width-packed eval on TPU: 64-channel BEV convs run ~6x under
        # MXU peak (half-empty lanes, measured on v5e); packing adjacent
        # column pairs into channels runs the same math at 128 wide.
        # Exact weight transform (s2d_conv_kernel); eval-only, batch/none
        # norm only (group-norm statistics are layout-dependent).
        s2d = (
            not train
            and self.planes <= int(
                os.environ.get("HEAL_TPU_S2D_MAX_PLANES", "64")
            )
            and self.groups == 1
            and parse_norm(self.norm)[0] in ("batch", "none")
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
            and (
                jax.default_backend() == "tpu"
                or os.environ.get("HEAL_TPU_FORCE_S2D") == "1"
            )
        )
        if s2d:
            x = pack_width(x)
        for i in range(self.blocks):
            stride = self.stride if i == 0 else 1
            if self.bottleneck_x:
                x = BottleneckX(
                    self.planes,
                    stride=stride,
                    width_per_group=self.width_per_group,
                    norm=self.norm,
                )(x, train, s2d=s2d)
            else:
                x = BasicBlock(
                    self.planes, stride=stride, groups=self.groups, norm=self.norm
                )(x, train, s2d=s2d)
        if s2d:
            x = unpack_width(x)
        return x


class DownsampleConv(nn.Module):
    """Shrink header (ref sub_modules/downsample_conv.py DoubleConv): per
    stage Conv(k, s, biased) -> ReLU -> Conv(3x3, biased) -> ReLU. The
    reference uses NO normalization here; structure matches so reference
    checkpoints transplant 1:1 (utils/transplant.py).

    Config lists kernal_size/stride/padding/dim per stage.
    """

    dims: Sequence[int]
    kernels: Sequence[int]
    strides: Sequence[int]
    paddings: Sequence[int] = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        pads = self.paddings or tuple((k - 1) // 2 for k in self.kernels)
        for i, (dim, k, s, p) in enumerate(
            zip(self.dims, self.kernels, self.strides, pads)
        ):
            x = nn.relu(
                nn.Conv(
                    dim, (k, k), strides=(s, s), padding=[(p, p)] * 2,
                    name=f"conv_{i}a",
                )(x)
            )
            x = nn.relu(
                nn.Conv(
                    dim, (3, 3), padding=[(1, 1)] * 2, name=f"conv_{i}b"
                )(x)
            )
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
