"""CoBEVT fusion: sparse window ("swap") attention over agents+pixels.

Capability parity with reference fuse_modules/fusion_in_one.py:374-429 +
swap_fusion_modules.py (SwapFusionBlockMask): alternating local-window and
global-grid axial attention where the token set of each window spans all
agents (agent_size * window^2 tokens), masked by agent validity; final
head averages the agent axis and projects.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.warp import warp_agents_to_ego

NEG_INF = -1e9


class SwapAttention(nn.Module):
    """One axial attention pass. mode='window': tokens are the L*ws*ws
    cells of each local window. mode='grid': tokens are the L*gs*gs cells
    of a dilated global grid (window/grid swap of MaxViT/CoBEVT). Carries
    the reference's 3D (agent, dy, dx) relative-position bias over the
    window tokens (swap_fusion_modules.py Attention:55-107)."""

    dim: int
    size: int
    heads: int = 8
    mode: str = "window"
    dropout: float = 0.0  # ref swap_fusion_modules.py:52 to_out Dropout

    def _rel_pos_bias(self, l):
        """(1, M, L*s*s, L*s*s) bias from a (2L-1)(2s-1)^2 table."""
        s = self.size
        coords = np.stack(
            np.meshgrid(
                np.arange(l), np.arange(s), np.arange(s), indexing="ij"
            ),
            -1,
        ).reshape(-1, 3)
        rel = coords[None, :, :] - coords[:, None, :]
        rel += np.array([l - 1, s - 1, s - 1])
        idx = (
            rel[..., 0] * (2 * s - 1) * (2 * s - 1)
            + rel[..., 1] * (2 * s - 1)
            + rel[..., 2]
        )
        table = self.param(
            "rel_pos_bias",
            nn.initializers.normal(0.02),
            ((2 * l - 1) * (2 * s - 1) ** 2, self.heads),
        )
        n = l * s * s
        bias = table[idx.reshape(-1)].reshape(n, n, self.heads)
        return bias.transpose(2, 0, 1)[None]

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        # x: (B, L, H, W, C); mask: (B, L)
        b, l, h, w, c = x.shape
        s = self.size
        ph, pw = (-h) % s, (-w) % s
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw
        if self.mode == "window":
            t = xp.reshape(b, l, hp // s, s, wp // s, s, c)
            t = t.transpose(0, 2, 4, 1, 3, 5, 6)  # (B, nh, nw, L, s, s, C)
        else:  # grid: dilated partition
            t = xp.reshape(b, l, s, hp // s, s, wp // s, c)
            t = t.transpose(0, 3, 5, 1, 2, 4, 6)  # (B, nh, nw, L, s, s, C)
        bh, nh, nw = t.shape[0], t.shape[1], t.shape[2]
        tokens = t.reshape(b * nh * nw, l * s * s, c)
        kv_mask = jnp.repeat(mask, s * s, axis=1)  # (B, L*s*s)
        kv_mask = jnp.broadcast_to(
            kv_mask[:, None, None, None, :], (b, nh, nw, 1, l * s * s)
        ).reshape(b * nh * nw, 1, 1, l * s * s)
        bias = self._rel_pos_bias(l)
        out = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            qkv_features=self.dim,
            attention_fn=lambda q_, k_, v_, **kw: nn.dot_product_attention(
                q_, k_, v_, bias=bias, **kw
            ),
        )(tokens, tokens, tokens, mask=kv_mask)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = out.reshape(b, nh, nw, l, s, s, c)
        if self.mode == "window":
            out = out.transpose(0, 3, 1, 4, 2, 5, 6)
        else:
            out = out.transpose(0, 3, 4, 1, 5, 2, 6)
        out = out.reshape(b, l, hp, wp, c)
        return out[:, :, :h, :w]


class SwapFusionBlock(nn.Module):
    dim: int
    window: int
    dropout: float = 0.0  # ref FeedForward/Attention dropout

    def _ffn(self, y, train):
        y = nn.Dropout(self.dropout, deterministic=not train)(
            nn.gelu(nn.Dense(2 * self.dim)(y))
        )
        return nn.Dropout(self.dropout, deterministic=not train)(
            nn.Dense(self.dim)(y)
        )

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        y = nn.LayerNorm()(x)
        x = x + SwapAttention(
            self.dim, self.window, mode="window", dropout=self.dropout
        )(y, mask, train)
        y = nn.LayerNorm()(x)
        x = x + self._ffn(y, train)
        y = nn.LayerNorm()(x)
        x = x + SwapAttention(
            self.dim, self.window, mode="grid", dropout=self.dropout
        )(y, mask, train)
        y = nn.LayerNorm()(x)
        x = x + self._ffn(y, train)
        return x


class CoBEVTFusion(nn.Module):
    """args: input_dim, window_size, depth (SwapFusionBlockMask stack)."""

    args: Any

    @nn.compact
    def __call__(self, features, affine, agent_mask, train: bool = False):
        cfg = self.args or {}
        depth = cfg.get("depth", 2)
        window = cfg.get("window_size", 4)
        # the reference configs carry ``drop_out`` (0.1 in the published
        # cobevt yamls); train mode draws from the Trainer's dropout rng
        dropout = float(cfg.get("drop_out", cfg.get("dropout", 0.0)))
        c = features.shape[-1]
        x = warp_agents_to_ego(features, affine)
        x = x * agent_mask[:, :, None, None, None]
        for i in range(depth):
            x = SwapFusionBlock(
                c, window, dropout=dropout, name=f"block_{i}"
            )(x, agent_mask, train)
        # mlp head: mean over agents (masked), LN + Dense
        m = agent_mask[:, :, None, None, None].astype(x.dtype)
        pooled = (x * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
        return nn.Dense(c)(nn.LayerNorm()(pooled))
