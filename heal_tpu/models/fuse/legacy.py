"""Legacy collaborative-fusion methods: When2com and TransformerFusion.

Capability parity with reference fuse_modules/when2com_fuse.py (362 LoC)
and fuse_modules/transformer_fuse.py (214 LoC), rebuilt on the TPU-first
masked fixed-L contract of fusion_in_one.py: features (B, L, H, W, C),
agent_mask (B, L), slot 0 = ego; batch handled by vectorized ops instead
of the reference's python loop over record_len splits.

When2com (ref when2com_fuse.py:16-131): each agent's ego-warped feature
map is summarized by a policy conv-net + key/query MLPs; a dot-product
handshake (softmax over the agent axis) weights the warped features.
``mode="activated"`` thresholds the attention at ``threshold`` (ref
activated_select :35-52) and reports num_connect, the average number of
non-ego links actually used.

The key/query generator pools the policy map to a fixed grid before the
MLP (the reference's km_generator_v2, when2com_fuse.py:253-270) so the
parameter count is independent of BEV resolution — the flatten-everything
km_generator variant ties 33M+ params to one (H, W).

TransformerFusion (ref transformer_fuse.py:77-206): sinusoidal 2D
positional encoding + one transformer encoder layer where, per BEV pixel,
the ego's token cross-attends over the L agent tokens at that pixel;
senders outside their warped field of view are masked out (ref roi_mask,
transformer_fuse.py:156-162).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.warp import warp_agents_to_ego
from ..layers import ConvNormAct

NEG_INF = -1e9


def sine_pe_2d(h: int, w: int, c: int, dtype=jnp.float32):
    """2D sinusoidal positional encoding, (H, W, C).

    Mirrors reference transformer_fuse.add_pe_map (:90-113): C/2 features
    for y, C/2 for x, interleaved sin/cos with temperature 10000, 1-based
    cumsum coordinates.
    """
    d = c // 2
    y = jnp.arange(1, h + 1, dtype=jnp.float32)
    x = jnp.arange(1, w + 1, dtype=jnp.float32)
    dim_t = jnp.arange(d, dtype=jnp.float32)
    dim_t = 10000.0 ** (2.0 * (dim_t // 2) / d)
    py = y[:, None] / dim_t  # (H, d)
    px = x[:, None] / dim_t  # (W, d)

    def interleave(p):
        return jnp.stack(
            [jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1
        ).reshape(*p.shape[:-1], -1)

    pos_y = jnp.broadcast_to(interleave(py)[:, None, :], (h, w, d))
    pos_x = jnp.broadcast_to(interleave(px)[None, :, :], (h, w, d))
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)


class PolicyNet(nn.Module):
    """Conv summarizer of a warped feature map (ref policy_net4,
    when2com_fuse.py:274-294): two stride-2 stages -> (H/4, W/4, C)."""

    width: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvNormAct(self.width, 3, 1)(x, train)
        x = ConvNormAct(self.width, 3, 2)(x, train)
        x = ConvNormAct(self.width, 3, 1)(x, train)
        x = ConvNormAct(self.width, 3, 2)(x, train)
        return x


class KMGenerator(nn.Module):
    """Key/query vector from a policy map (ref km_generator_v2,
    when2com_fuse.py:253-270): pool to a fixed grid, then a 3-layer MLP."""

    out_size: int
    pool_hw: tuple = (4, 4)

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        ph, pw = self.pool_hw
        # adaptive average pool to (ph, pw)
        x = jax.image.resize(x, (b, ph, pw, x.shape[-1]), method="linear")
        x = x.reshape(b, -1)
        x = nn.relu(nn.Dense(256)(x))
        x = nn.relu(nn.Dense(128)(x))
        return nn.Dense(self.out_size)(x)


class When2comFusion(nn.Module):
    """Learned-handshake fusion (When2com; ref when2com_fuse.py:16-131)."""

    args: Any

    @nn.compact
    def __call__(self, features, affine, agent_mask, train: bool = False):
        cfg = self.args
        query_size = cfg.get("query_size", 32)
        key_size = cfg.get("key_size", 256)
        mode = cfg.get("mode", "softmax")
        threshold = cfg.get("threshold", 0.2)

        b, l, h, w, c = features.shape
        warped = warp_agents_to_ego(features, affine)  # (B, L, H, W, C)
        warped = warped * agent_mask[:, :, None, None, None]

        # shared policy map per agent; keys from all, query from ego
        pmap = PolicyNet(width=cfg.get("policy_width", 256), name="policy")(
            warped.reshape(b * l, h, w, c), train
        )
        pmap = pmap.reshape(b, l, *pmap.shape[1:])
        keys = KMGenerator(key_size, name="key_net")(
            pmap.reshape(b * l, *pmap.shape[2:])
        ).reshape(b, l, key_size)
        query = KMGenerator(query_size, name="query_net")(pmap[:, 0])

        # MIMO dot-product handshake (ref :297-343): project query into
        # key space, logits over the agent (key) axis.
        q = nn.Dense(key_size, name="q_proj")(query)  # (B, key)
        logits = jnp.einsum("blk,bk->bl", keys, q)
        logits = jnp.where(agent_mask > 0, logits, NEG_INF)
        attn = jax.nn.softmax(logits, axis=1)  # (B, L)

        if mode == "activated":
            coef = attn * (attn > threshold).astype(attn.dtype)
            # avg #non-ego links actually used (ref activated_select :44-51)
            num_connect = (coef[:, 1:] > 0).sum(axis=1).astype(attn.dtype)
            self.sow("intermediates", "num_connect", num_connect.mean())
        else:
            coef = attn
        return (warped * coef[:, :, None, None, None]).sum(axis=1)


class TransformerFusion(nn.Module):
    """Per-pixel agent-axis transformer encoder layer with 2D sine PE
    (ref transformer_fuse.py:35-206)."""

    args: Any

    @nn.compact
    def __call__(self, features, affine, agent_mask, train: bool = False):
        cfg = self.args
        n_head = cfg.get("n_head", 8)
        b, l, h, w, c = features.shape

        warped = warp_agents_to_ego(features, affine)
        # sender FOV mask in the ego frame (ref roi_mask :156-162)
        ones = jnp.ones((b, l, h, w, 1), features.dtype)
        roi = warp_agents_to_ego(ones, affine)  # (B, L, H, W, 1)
        valid = (roi[..., 0] > 0.5) & (agent_mask[:, :, None, None] > 0)

        pe = sine_pe_2d(h, w, c, features.dtype)
        with_pe = warped + pe[None, None]

        q = with_pe[:, 0]  # (B, H, W, C) ego tokens, PE'd
        q_ = q.reshape(b, h * w, 1, c).reshape(b * h * w, 1, c)
        k_ = with_pe.transpose(0, 2, 3, 1, 4).reshape(b * h * w, l, c)
        v_ = warped.transpose(0, 2, 3, 1, 4).reshape(b * h * w, l, c)
        kv_mask = valid.transpose(0, 2, 3, 1).reshape(b * h * w, 1, 1, l)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=n_head, qkv_features=c, name="mha"
        )
        ctx = attn(q_, k_, v_, mask=kv_mask).reshape(b, h, w, c)
        # post-attention FFN + residual norms (ref EncodeLayer :50-74)
        y = nn.LayerNorm()(ctx + warped[:, 0])
        ff = nn.Dense(c)(nn.relu(nn.Dense(c)(y)))
        return nn.LayerNorm()(y + ff)
