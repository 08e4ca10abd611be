"""Single-scale collaborative fusion methods.

Capability parity with reference fuse_modules/fusion_in_one.py: MaxFusion
(F-Cooper), AttFusion (AttFuse), DiscoFusion (DiscoNet), V2VNetFusion,
Where2commFusion, Who2comFusion. V2X-ViT and CoBEVT live in their own
modules (v2xvit.py, cobevt.py).

TPU-first contract (vs the reference's ragged record_len loops): features
are (B, L, H, W, C) with agent_mask (B, L); slot 0 is the ego. Every module
first warps all agents into the ego frame (ops/warp.py) and masks padded
slots out of its reduction — softmaxes get -inf logits, maxes get -inf
features, means divide by the true agent count. vmap over batch replaces
the python loop.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.warp import warp_agents_to_ego
from ..layers import ConvNormAct
from .where2comm_comm import CommMask, apply_comm_mask

NEG_INF = -1e9


def build_fusion(method: str, args: dict):
    """Factory keyed by the config's fusion_method string
    (ref heter_model_baseline.py:99-115 naming)."""
    table = {
        "max": lambda: MaxFusion(),
        "att": lambda: AttFusion(),
        "disconet": lambda: DiscoFusion(args.get("in_channels", 64)),
        "v2vnet": lambda: V2VNetFusion(args),
        "where2comm": lambda: Where2commFusion(
            args.get("in_channels", 64),
            threshold=args.get("threshold", 0.01),
            gaussian_smooth=args.get("gaussian_smooth", True),
            smooth_sigma=args.get("smooth_sigma", 1.0),
            agg_mode=str(
                (args.get("agg_operator") or {}).get("mode", "transformer")
            ).lower(),
            num_heads=(args.get("agg_operator") or {}).get("n_head", 8),
            with_spe=(args.get("agg_operator") or {}).get("with_spe", False),
        ),
        "who2com": lambda: Who2comFusion(args.get("in_channels", 64)),
    }
    if method == "v2xvit":
        from .v2xvit import V2XViTFusion

        return V2XViTFusion(args)
    if method == "cobevt":
        from .cobevt import CoBEVTFusion

        return CoBEVTFusion(args)
    if method == "when2com":
        from .legacy import When2comFusion

        return When2comFusion(args)
    if method == "transformer":
        from .legacy import TransformerFusion

        return TransformerFusion(args)
    if method not in table:
        raise KeyError(f"unknown fusion method {method!r}")
    return table[method]()


class MaxFusion(nn.Module):
    """Elementwise max over ego-warped agent features (F-Cooper)."""

    @nn.compact
    def __call__(self, features, affine, agent_mask, train: bool = False):
        warped = warp_agents_to_ego(features, affine)  # (B, L, H, W, C)
        m = agent_mask[:, :, None, None, None]
        warped = jnp.where(m, warped, NEG_INF)
        return warped.max(axis=1)


class ScaledDotProductAttention(nn.Module):
    """Per-pixel agent-axis self-attention (ref fuse_modules/self_attn.py)."""

    @nn.compact
    def __call__(self, x, mask):
        # x: (B, L, H, W, C); mask: (B, L)
        c = x.shape[-1]
        logits = jnp.einsum("blhwc,bmhwc->bhwlm", x, x) / jnp.sqrt(
            jnp.asarray(c, x.dtype)
        )
        logits = jnp.where(mask[:, None, None, None, :], logits, NEG_INF)
        attn = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhwlm,bmhwc->blhwc", attn, x)


class AttFusion(nn.Module):
    """Per-pixel scaled-dot-product attention across agents; ego output."""

    @nn.compact
    def __call__(self, features, affine, agent_mask, train: bool = False):
        warped = warp_agents_to_ego(features, affine)
        warped = warped * agent_mask[:, :, None, None, None]
        att = ScaledDotProductAttention()(warped, agent_mask)
        return att[:, 0]


class DiscoFusion(nn.Module):
    """Pixel-weight MLP over (neighbor, ego) concat + agent softmax
    (DiscoNet; ref fusion_in_one.py:153-201, disco_fuse.PixelWeightLayer)."""

    feature_dims: int
    norm: str = "batch"

    @nn.compact
    def __call__(self, features, affine, agent_mask, train: bool = False):
        b, l, h, w, c = features.shape
        warped = warp_agents_to_ego(features, affine)
        ego = jnp.broadcast_to(warped[:, 0:1], warped.shape)
        cat = jnp.concatenate([warped, ego], axis=-1).reshape(b * l, h, w, 2 * c)
        # PixelWeightLayer: conv stack down to 1 channel
        x = ConvNormAct(self.feature_dims, 1, 1, norm=self.norm)(cat, train)
        x = ConvNormAct(32, 1, 1, norm=self.norm)(x, train)
        logit = nn.Conv(1, (1, 1))(x).reshape(b, l, h, w, 1)
        logit = jnp.where(agent_mask[:, :, None, None, None], logit, NEG_INF)
        weight = jax.nn.softmax(logit, axis=1)
        return (warped * weight).sum(axis=1)


class ConvGRUCell(nn.Module):
    """Convolutional GRU cell (ref sub_modules/convgru.py)."""

    hidden_dim: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, h):
        zr = nn.Conv(2 * self.hidden_dim, (self.kernel, self.kernel))(
            jnp.concatenate([x, h], axis=-1)
        )
        z, r = jnp.split(jax.nn.sigmoid(zr), 2, axis=-1)
        n = jnp.tanh(
            nn.Conv(self.hidden_dim, (self.kernel, self.kernel))(
                jnp.concatenate([x, r * h], axis=-1)
            )
        )
        return (1 - z) * h + z * n


class V2VNetFusion(nn.Module):
    """Iterative ConvGRU message passing over the agent graph
    (ref fusion_in_one.py:203-318)."""

    args: Any

    @nn.compact
    def __call__(self, features, affine, agent_mask, train: bool = False):
        cfg = self.args
        c = cfg["in_channels"]
        num_iter = cfg.get("num_iteration", 2)
        agg = cfg.get("agg_operator", "avg")
        gru_flag = cfg.get("gru_flag", True)

        b, l, h, w, _ = features.shape
        msg_cnn = nn.Conv(c, (3, 3), name="msg_cnn")
        gru = ConvGRUCell(
            c, cfg.get("conv_gru", {}).get("kernel_size", [[3, 3]])[0][0]
        )
        mlp = nn.Dense(c, name="mlp")

        from ...ops.warp import warp_pairwise

        # sender FOV mask in every receiver's frame: warp all-ones maps
        ones = jnp.ones((b, l, h, w, 1), features.dtype)
        roi = warp_pairwise(ones, affine)  # (B, I, J, h, w, 1)
        # sender validity on the J axis
        mvalid = agent_mask[:, None, :, None, None, None].astype(
            features.dtype
        )

        node = features
        for _ in range(num_iter):
            # all-pairs messages in one traced warp (no per-receiver loop)
            warped = warp_pairwise(node, affine)  # (B, I, J, h, w, C)
            ego_i = jnp.broadcast_to(node[:, :, None], warped.shape)
            msg = msg_cnn(
                jnp.concatenate([warped, ego_i], axis=-1).reshape(
                    b * l * l, h, w, 2 * c
                )
            ).reshape(b, l, l, h, w, c)
            msg = msg * roi * mvalid
            if agg == "avg":
                denom = jnp.maximum(
                    agent_mask.sum(1).astype(msg.dtype), 1.0
                )[:, None, None, None, None]
                agg_f = msg.sum(axis=2) / denom  # (B, I, h, w, C)
            else:
                agg_f = jnp.where(mvalid > 0, msg, NEG_INF).max(axis=2)
            if gru_flag:
                new_node = gru(
                    agg_f.reshape(b * l, h, w, c),
                    node.reshape(b * l, h, w, c),
                )
            else:
                new_node = (node + agg_f).reshape(b * l, h, w, c)
            node = new_node.reshape(b, l, h, w, c)
        out = node[:, 0]
        return mlp(out)


def sinusoidal_pe(h: int, w: int, c: int, dtype=jnp.float32):
    """2D sine/cosine positional map, (H, W, C).

    Formula parity with ref where2comm_attn.py:148-169 (add_pe_map):
    C/2 dims encode y, C/2 encode x, interleaved sin/cos over a 10000^k
    temperature ladder. Requires C divisible by 4.
    """
    assert c % 4 == 0, f"sinusoidal_pe needs channels % 4 == 0, got {c}"
    d = c // 2
    dim_t = 10000.0 ** (2 * (jnp.arange(d) // 2) / d)  # (d,)
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None] / dim_t  # (h, d)
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[:, None] / dim_t  # (w, d)

    def interleave(p):  # sin on even slots, cos on odd slots
        return jnp.stack(
            [jnp.sin(p[:, 0::2]), jnp.cos(p[:, 1::2])], axis=-1
        ).reshape(p.shape[0], -1)

    py, px = interleave(y), interleave(x)
    pos = jnp.concatenate(
        [
            jnp.broadcast_to(py[:, None, :], (h, w, d)),
            jnp.broadcast_to(px[None, :, :], (h, w, d)),
        ],
        axis=-1,
    )
    return pos.astype(dtype)


class Where2commFusion(nn.Module):
    """Confidence-masked transmission + configurable aggregation
    (ref fusion_in_one.py:431-484, where2comm_attn.py:44-146 agg modes
    MAX / ATTEN / Transformer, + comm_modules/where2comm.py:34-79).

    When ``confidence`` (per-agent detection confidence, (B, L, H, W, 1))
    is given, non-ego agents transmit only cells whose smoothed confidence
    exceeds ``threshold``; the fraction sent is returned as comm_rate.

    agg_mode selects the reference's agg_operator family: "transformer"
    (EncodeLayer MHA + FFN, optional sinusoidal PE on q/k via with_spe),
    "atten" (parameter-free per-pixel scaled dot-product self-attention,
    AttenFusion), or "max" (MaxFusion).
    """

    feature_dims: int
    num_heads: int = 8
    threshold: float = 0.01
    gaussian_smooth: bool = True
    smooth_sigma: float = 1.0
    agg_mode: str = "transformer"
    with_spe: bool = False

    @nn.compact
    def __call__(
        self,
        features,
        affine,
        agent_mask,
        train: bool = False,
        confidence=None,
        comm_mask=None,
    ):
        b, l, h, w, c = features.shape
        comm_rate = jnp.asarray(1.0, features.dtype)
        if comm_mask is not None:
            # externally-built mask (multi-scale wiring pools one level-0
            # mask across levels, ref where2comm_attn.py:264-275)
            features = apply_comm_mask(features, comm_mask)
        elif confidence is not None:
            mask, comm_rate = CommMask(
                threshold=self.threshold,
                gaussian_smooth=self.gaussian_smooth,
                smooth_sigma=self.smooth_sigma,
            )(confidence, train)
            # gate in the SENDER frame before transmission/warp
            features = apply_comm_mask(features, mask)
            self.sow("intermediates", "comm_rate", comm_rate)
        warped = warp_agents_to_ego(features, affine)
        if self.agg_mode == "max":
            m = agent_mask[:, :, None, None, None]
            out = jnp.where(m, warped, NEG_INF).max(axis=1)
        elif self.agg_mode == "atten":
            gated = warped * agent_mask[:, :, None, None, None]
            out = ScaledDotProductAttention()(gated, agent_mask)[:, 0]
        else:
            # queries: ego pixels; keys/values: same pixel across agents
            q = warped[:, 0:1]  # (B, 1, H, W, C)
            k = warped
            if self.with_spe:
                pe = sinusoidal_pe(h, w, c, warped.dtype)
                q = q + pe
                k = k + pe  # PE enters q/k only; values stay raw
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, qkv_features=c, name="mha"
            )
            q_ = q.transpose(0, 2, 3, 1, 4).reshape(b * h * w, 1, c)
            k_ = k.transpose(0, 2, 3, 1, 4).reshape(b * h * w, l, c)
            v_ = warped.transpose(0, 2, 3, 1, 4).reshape(b * h * w, l, c)
            kv_mask = jnp.broadcast_to(
                agent_mask[:, None, None, None, None, :], (b, h, w, 1, 1, l)
            ).reshape(b * h * w, 1, 1, l)
            fused = attn(q_, k_, v_, mask=kv_mask)
            fused = fused.reshape(b, h, w, c)
            # FFN + residual norms (EncodeLayer)
            y = nn.LayerNorm()(fused + q[:, 0])
            ff = nn.Dense(c)(nn.relu(nn.Dense(c)(y)))
            out = nn.LayerNorm()(y + ff)
        if confidence is not None and comm_mask is None:
            return out, comm_rate
        return out


class Who2comFusion(nn.Module):
    """Agent attention + conv decode of (ego, attended) concat
    (ref fusion_in_one.py:486-538)."""

    feature_dims: int

    @nn.compact
    def __call__(self, features, affine, agent_mask, train: bool = False):
        warped = warp_agents_to_ego(features, affine)
        warped = warped * agent_mask[:, :, None, None, None]
        att = ScaledDotProductAttention()(warped, agent_mask)[:, 0]
        cat = jnp.concatenate([features[:, 0], att], axis=-1)
        return nn.Conv(self.feature_dims, (3, 3), name="decode_layer")(cat)
