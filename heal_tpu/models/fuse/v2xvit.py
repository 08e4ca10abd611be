"""V2X-ViT fusion: heterogeneous multi-agent transformer.

Capability parity with reference fuse_modules/fusion_in_one.py:320-372 +
sub_modules/v2xvit_basic.py (V2XTransformer), hmsa.py (heterogeneous
multi-agent self-attention) and mswin.py (multi-scale window attention):
per-block = HMSA across the agent axis (per pixel, with per-agent-type
relative embeddings) -> multi-scale windowed spatial self-attention per
agent -> MLP, all with residuals + LayerNorm.

TPU-first: agents fixed at L with masks; windows are static reshapes; the
agent axis attention batches over all pixels as one big MXU matmul.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.warp import warp_agents_to_ego

NEG_INF = -1e9


class HMSA(nn.Module):
    """Heterogeneous multi-agent self-attention: per-pixel attention over
    the agent axis, with a learned per-agent-slot bias standing in for the
    reference's type embeddings (types are known per slot)."""

    dim: int
    heads: int = 8

    @nn.compact
    def __call__(self, x, mask):
        # x: (B, L, H, W, C); mask: (B, L)
        b, l, h, w, c = x.shape
        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = self.dim // self.heads

        def split_heads(t):
            return t.reshape(b, l, h, w, self.heads, hd)

        q, k, v = map(split_heads, (q, k, v))
        logits = jnp.einsum("blhwnd,bmhwnd->bhwnlm", q, k) / jnp.sqrt(
            jnp.asarray(hd, x.dtype)
        )
        rel = self.param(
            "agent_bias", nn.initializers.zeros, (1, 1, 1, 1, l, l)
        )
        logits = logits + rel
        logits = jnp.where(
            mask[:, None, None, None, None, :], logits, NEG_INF
        )
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhwnlm,bmhwnd->blhwnd", attn, v)
        out = out.reshape(b, l, h, w, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class WindowAttention(nn.Module):
    """Non-overlapping window self-attention at one window size."""

    dim: int
    window: int
    heads: int = 8

    @nn.compact
    def __call__(self, x):
        # x: (N, H, W, C); H, W divisible by window (caller pads)
        n, h, w, c = x.shape
        ws = self.window
        x = x.reshape(n, h // ws, ws, w // ws, ws, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim
        )(x)
        attn = attn.reshape(n, h // ws, w // ws, ws, ws, c)
        attn = attn.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, c)
        return attn


class MSwin(nn.Module):
    """Multi-scale window attention: parallel branches at different
    window sizes, fused by summation (ref mswin.py uses split-attn; we
    use a learned softmax gate over branches)."""

    dim: int
    windows: tuple = (2, 4)

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        outs = []
        for ws in self.windows:
            ph = (-h) % ws
            pw = (-w) % ws
            xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            o = WindowAttention(self.dim, ws, name=f"win{ws}")(xp)
            outs.append(o[:, :h, :w])
        gate = self.param(
            "branch_gate", nn.initializers.zeros, (len(outs),)
        )
        gw = jax.nn.softmax(gate)
        return sum(gi * oi for gi, oi in zip(gw, outs))


class V2XViTBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, mask):
        b, l, h, w, c = x.shape
        y = nn.LayerNorm()(x)
        x = x + HMSA(self.dim, name="hmsa")(y, mask)
        flat = x.reshape(b * l, h, w, c)
        y = nn.LayerNorm()(flat)
        flat = flat + MSwin(self.dim, name="mswin")(y)
        y = nn.LayerNorm()(flat)
        mlp = nn.Dense(self.dim)(nn.gelu(nn.Dense(2 * self.dim)(y)))
        flat = flat + mlp
        return flat.reshape(b, l, h, w, c)


class V2XViTFusion(nn.Module):
    """args: transformer {encoder {depth ...}} or flat {depth, dim}."""

    args: Any

    @nn.compact
    def __call__(self, features, affine, agent_mask, train: bool = False):
        cfg = self.args or {}
        depth = (
            cfg.get("transformer", {})
            .get("encoder", {})
            .get("num_blocks", cfg.get("depth", 2))
        )
        c = features.shape[-1]
        x = warp_agents_to_ego(features, affine)
        x = x * agent_mask[:, :, None, None, None]
        for i in range(depth):
            x = V2XViTBlock(c, name=f"block_{i}")(x, agent_mask)
        return nn.LayerNorm()(x[:, 0])
