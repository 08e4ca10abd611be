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
import jax
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


class ResMLPBlock(nn.Module):
    """LayerNorm -> n x (Dense + GELU), residual (SCAligner building
    block, ref feature_alignnet_modules.ResMLP:453-463)."""

    dim: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.LayerNorm()(x)
        for _ in range(self.num_layers):
            h = nn.gelu(nn.Dense(self.dim)(h))
        return x + h


class XCA(nn.Module):
    """Cross-covariance attention: attention over the CHANNEL axis with
    H*W tokens (ref feature_alignnet_modules.XCA:33-72). NHWC-native."""

    dim: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        h = self.num_heads
        d = c // h
        temperature = self.param(
            "temperature", nn.initializers.ones, (h, 1, 1)
        )
        qkv = nn.Dense(3 * c, use_bias=True, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, h, d)
        # channel tokens: transpose to (B, h, d, N), L2-normalize over N
        q = q.transpose(0, 2, 3, 1)
        k = k.transpose(0, 2, 3, 1)
        v = v.transpose(0, 2, 3, 1)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-6)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-6)
        attn = jax.nn.softmax(
            jnp.einsum("bhdn,bhen->bhde", q, k) * temperature, axis=-1
        )
        out = jnp.einsum("bhde,bhen->bhdn", attn, v)  # (B, h, d, N)
        out = out.transpose(0, 3, 1, 2).reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


class SDTABlock(nn.Module):
    """Split-depthwise-transpose-attention encoder block
    (ref feature_alignnet_modules.SDTAEncoder:105-162): per-channel 1x1
    convs -> XCA over channels -> inverted-bottleneck MLP, residual."""

    dim: int
    expan_ratio: int = 4
    num_conv: int = 2
    num_heads: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, hh, ww, c = x.shape
        inp = x
        for i in range(self.num_conv):
            x = nn.relu(
                nn.Conv(
                    c, (1, 1), feature_group_count=c, name=f"dwconv_{i}"
                )(x)
            )
        gamma_xca = self.param(
            "gamma_xca", nn.initializers.constant(1e-6), (c,)
        )
        tokens = x.reshape(b, hh * ww, c)
        tokens = tokens + gamma_xca * XCA(
            c, num_heads=self.num_heads, name="xca"
        )(nn.LayerNorm(name="norm_xca")(tokens))
        x = tokens.reshape(b, hh, ww, c)
        h = nn.LayerNorm(name="norm")(x)
        h = nn.gelu(nn.Dense(self.expan_ratio * c, name="pwconv1")(h))
        h = nn.Dense(c, name="pwconv2")(h)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (c,))
        return inp + gamma * h


class ChannelAttention(nn.Module):
    """CBAM channel attention (ref sub_modules/cbam.py)."""

    dim: int
    ratio: int = 16

    @nn.compact
    def __call__(self, x):
        hidden = max(self.dim // self.ratio, 1)
        mlp = nn.Sequential(
            [nn.Dense(hidden, use_bias=False), nn.relu,
             nn.Dense(self.dim, use_bias=False)]
        )
        avg = mlp(x.mean(axis=(1, 2)))
        mx = mlp(x.max(axis=(1, 2)))
        return jax.nn.sigmoid(avg + mx)[:, None, None, :]


class SpatialAttention(nn.Module):
    @nn.compact
    def __call__(self, x):
        stat = jnp.concatenate(
            [x.mean(-1, keepdims=True), x.max(-1, keepdims=True)], axis=-1
        )
        return jax.nn.sigmoid(nn.Conv(1, (7, 7), use_bias=False)(stat))


class CBAMBlock(nn.Module):
    """conv1x1-BN-relu-conv1x1-BN + channel & spatial attention, residual
    (ref cbam.BasicBlock:62-97)."""

    dim: int
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvNormAct(self.dim, 1, 1, norm=self.norm)(x, train)
        h = ConvNormAct(self.dim, 1, 1, norm=self.norm, act=False)(h, train)
        h = h * ChannelAttention(self.dim)(h)
        h = h * SpatialAttention()(h)
        return nn.relu(x + h)


class FALayer(nn.Module):
    """Feature-alignment layer: ARNet block modulated by per-pixel
    gamma/beta from the guidance map (ref FALayer:227-242)."""

    in_dim: int
    out_dim: int
    img_dim: int

    @nn.compact
    def __call__(self, feat, img):
        # ARNetBlock: 1x1 -> relu -> grouped 3x3 -> relu -> 1x1
        h = nn.relu(nn.Conv(self.in_dim, (1, 1), name="ar1")(feat))
        h = nn.relu(
            nn.Conv(
                self.in_dim, (3, 3), feature_group_count=8, name="ar2"
            )(h)
        )
        h = nn.Conv(self.out_dim, (1, 1), name="ar3")(h)
        inter = nn.relu(nn.Conv(self.img_dim, (1, 1), name="conv1")(img))
        gamma = nn.Conv(self.out_dim, (1, 1), name="conv2")(inter)
        beta = nn.Conv(self.out_dim, (1, 1), name="conv3")(inter)
        return h * gamma + beta


class FANet(nn.Module):
    """U-shaped gamma/beta-modulated aligner (ref FANet:244-275); the
    guidance pyramid is the detached input itself."""

    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dim

        def pool(t):
            return nn.max_pool(t, (2, 2), strides=(2, 2))

        def up(t):
            b, hh, ww, c = t.shape
            return jax.image.resize(t, (b, hh * 2, ww * 2, c), "bilinear")

        img0 = jax.lax.stop_gradient(x)
        img1 = pool(img0)
        img2 = pool(img1)
        f0 = FALayer(d, d, d, name="fa1")(x, img0)
        f1 = FALayer(d, 2 * d, d, name="fa2")(pool(f0), img1)
        f2 = FALayer(2 * d, 4 * d, d, name="fa3")(pool(f1), img2)
        f3 = FALayer(4 * d, 2 * d, d, name="fa4")(up(f2), img1) + nn.Conv(
            2 * d, (1, 1), name="skip1"
        )(f1)
        f4 = FALayer(2 * d, d, d, name="fa5")(up(f3), img0) + nn.Conv(
            d, (1, 1), name="skip2"
        )(f0)
        return f4


class AlignNet(nn.Module):
    """args: {core_method: identity|res1x1|res3x3|convnext|scaligner|
    sdta|cbam|fanet, args: {...}} (ref feature_alignnet.py:12-39)."""

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
        if method == "scaligner":
            layers = sub.get("num_of_layers", 2)
            for _ in range(depth):
                x = ResMLPBlock(self.dim, layers)(x, train)
            return x
        if method == "sdta":
            for _ in range(depth):
                x = SDTABlock(self.dim)(x, train)
            return x
        if method == "cbam":
            for _ in range(depth):
                x = CBAMBlock(self.dim, self.norm)(x, train)
            return x
        if method == "fanet":
            return FANet(self.dim)(x, train)
        raise KeyError(f"unknown aligner core_method {method!r}")
