"""Heterogeneous baseline models: swappable fusion + late variant.

Capability parity with reference models/heter_model_baseline.py (:99-115 —
per-modality encoder/backbone/aligner with any fusion_in_one method) and
heter_model_late.py (single-agent forward per modality for late fusion).
Re-uses the ModalityBranch/packing machinery of heter_pyramid.py.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .heads import DetectionHeads
from .heter_pyramid import (ModalityBranch, center_crop_or_pad,
                            lidar_first, modality_list)
from .point_pillar import _shrink_from_args
from .registry import register_model


@register_model("heter_model_baseline")
class HeterModelBaseline(nn.Module):
    """args: m1..m4 blocks + fusion_method (+ method args) + shrink_header
    + anchor_number + dir_args."""

    args: Any

    def setup(self):
        a = self.args
        norm = a.get("norm", "batch")
        self.modalities = modality_list(a)
        self.branches = {
            m: ModalityBranch(
                modality=m, cfg=a[m], norm=norm, name=f"branch_{m}"
            )
            for m in self.modalities
        }
        from .fuse import build_fusion

        method = a["fusion_method"]
        fusion_args = dict(a.get(method, {}) or {})
        fusion_args.setdefault("in_channels", a.get("in_head", 64))
        self.fusion = build_fusion(method, fusion_args)
        self.shrink = _shrink_from_args(a, norm)
        self.heads = DetectionHeads(
            anchor_number=a["anchor_number"],
            use_dir="dir_args" in a,
            num_bins=a.get("dir_args", {}).get("num_bins", 2),
            use_iou=a.get("use_iou", False),
            name="heads",
        )

    def __call__(self, batch: dict, train: bool = False):
        a = self.args
        agent_mask = batch["agent_mask"]
        b, l = agent_mask.shape
        lidar_range = a["lidar_range"]

        feat_all = None
        out_aux = {}
        for m in lidar_first(self.modalities, self.args):
            if f"inputs_{m}" not in batch:
                continue
            inputs = batch[f"inputs_{m}"]
            lead = jax.tree.leaves(inputs)[0]
            lm = lead.shape[1]
            flat = jax.tree.map(
                lambda x: x.reshape((b * lm,) + x.shape[2:]), inputs
            )
            feat, aux = self.branches[m](flat, train)
            if aux.get("depth_logits") is not None:
                out_aux[f"depth_items_{m}"] = aux["depth_logits"]
            if a[m].get("sensor_type", "lidar") == "camera" and feat_all is not None:
                feat = center_crop_or_pad(
                    feat, feat_all.shape[2], feat_all.shape[3]
                )
            feat = feat.reshape((b, lm) + feat.shape[1:])
            if feat_all is None:
                h, w, c = feat.shape[2:]
                feat_all = jnp.zeros((b, l + 1, h, w, c), feat.dtype)
            feat_all = jax.vmap(
                lambda canvas, slots, f: canvas.at[slots].add(f)
            )(feat_all, batch[f"slots_{m}"], feat)
        assert feat_all is not None
        feat_all = feat_all[:, :l]

        if self.shrink is not None:
            flat = feat_all.reshape((b * l,) + feat_all.shape[2:])
            feat_all = self.shrink(flat, train).reshape(
                (b, l) + flat.shape[1:][:2] + (-1,)
            )

        # per-agent predictions from the SHARED heads: supervise_single
        # targets and the where2comm transmission confidence (the
        # reference reuses the cls head as psm,
        # models/point_pillar_where2comm semantics)
        need_single = a.get("supervise_single", False)
        is_w2c = a["fusion_method"] == "where2comm"
        confidence = None
        if need_single or is_w2c:
            flat = feat_all.reshape((b * l,) + feat_all.shape[2:])
            single = self.heads(flat)
            if need_single:
                for k, v in single.items():
                    out_aux[f"{k}_single"] = v
            if is_w2c:
                conf = jax.nn.sigmoid(single["cls_preds"]).max(
                    axis=-1, keepdims=True
                )
                confidence = conf.reshape((b, l) + conf.shape[1:])

        if is_w2c:
            fused, comm_rate = self.fusion(
                feat_all,
                batch["pairwise_affine"],
                agent_mask,
                train,
                confidence=confidence,
            )
            out_aux["comm_rate"] = comm_rate
        elif a["fusion_method"] == "v2xvit":
            # typed HMSA: the transformer conditions on each agent's
            # MODALITY, so embeddings follow the sensor type when
            # assignments shuffle (ref sub_modules/hmsa.py)
            fused = self.fusion(
                feat_all,
                batch["pairwise_affine"],
                agent_mask,
                train,
                agent_types=batch["agent_modality"],
            )
        else:
            fused = self.fusion(
                feat_all, batch["pairwise_affine"], agent_mask, train
            )
        out = self.heads(fused)
        out.update(out_aux)
        return out


@register_model("heter_model_baseline_ms")
class HeterModelBaselineMS(nn.Module):
    """Multiscale heterogeneous baseline: fuse at every fusion-backbone
    level, then deblock-decode (ref models/heter_model_baseline_ms.py:
    level 0 fuses the raw assembled features — the backbone's first
    stage is omitted — and levels i>=1 fuse stage-i outputs)."""

    args: Any

    def setup(self):
        from .fuse import build_fusion
        from .resnet_bev import ResNetBEVBackbone

        a = self.args
        norm = a.get("norm", "batch")
        self.modalities = modality_list(a)
        self.branches = {
            m: ModalityBranch(
                modality=m, cfg=a[m], norm=norm, name=f"branch_{m}"
            )
            for m in self.modalities
        }
        fb = a["fusion_backbone"]
        self.backbone = ResNetBEVBackbone(
            layer_nums=tuple(fb["layer_nums"]),
            layer_strides=tuple(fb["layer_strides"]),
            num_filters=tuple(fb["num_filters"]),
            upsample_strides=tuple(fb.get("upsample_strides", ())),
            num_upsample_filter=tuple(fb.get("num_upsample_filter", ())),
            norm=norm,
            name="fusion_backbone",
        )
        method = a["fusion_method"]
        self.fusions = [
            build_fusion(
                method,
                dict(
                    a.get(method, {}) or {},
                    in_channels=fb["num_filters"][i],
                ),
            )
            for i in range(len(fb["layer_nums"]))
        ]
        self.shrink = _shrink_from_args(a, norm)
        self.heads = DetectionHeads(
            anchor_number=a["anchor_number"],
            use_dir="dir_args" in a,
            num_bins=a.get("dir_args", {}).get("num_bins", 2),
            name="heads",
        )
        if a.get("supervise_single", False):
            self.heads_single = DetectionHeads(
                anchor_number=a["anchor_number"],
                use_dir="dir_args" in a,
                num_bins=a.get("dir_args", {}).get("num_bins", 2),
                name="heads_single",
            )
        else:
            self.heads_single = None

    def __call__(self, batch: dict, train: bool = False):
        a = self.args
        agent_mask = batch["agent_mask"]
        b, l = agent_mask.shape

        feat_all = None
        out_aux = {}
        for m in lidar_first(self.modalities, self.args):
            if f"inputs_{m}" not in batch:
                continue
            inputs = batch[f"inputs_{m}"]
            lead = jax.tree.leaves(inputs)[0]
            lm = lead.shape[1]
            flat = jax.tree.map(
                lambda x: x.reshape((b * lm,) + x.shape[2:]), inputs
            )
            feat, aux = self.branches[m](flat, train)
            if aux.get("depth_logits") is not None:
                out_aux[f"depth_items_{m}"] = aux["depth_logits"]
            if (
                a[m].get("sensor_type", "lidar") == "camera"
                and feat_all is not None
            ):
                feat = center_crop_or_pad(
                    feat, feat_all.shape[2], feat_all.shape[3]
                )
            feat = feat.reshape((b, lm) + feat.shape[1:])
            if feat_all is None:
                h, w, c = feat.shape[2:]
                feat_all = jnp.zeros((b, l + 1, h, w, c), feat.dtype)
            feat_all = jax.vmap(
                lambda canvas, slots, f: canvas.at[slots].add(f)
            )(feat_all, batch[f"slots_{m}"], feat)
        assert feat_all is not None
        feat_all = feat_all[:, :l]

        if self.heads_single is not None:
            flat = feat_all.reshape((b * l,) + feat_all.shape[2:])
            for k, v in self.heads_single(flat).items():
                out_aux[f"{k}_single"] = v

        x = feat_all.reshape((b * l,) + feat_all.shape[2:])
        fused_levels = []
        for i, fusion in enumerate(self.fusions):
            if i > 0:
                x = self.backbone.stages[i](x, train)
            xl = x.reshape((b, l) + x.shape[1:])
            extra = (
                {"agent_types": batch["agent_modality"]}
                if self.args["fusion_method"] == "v2xvit"
                else {}
            )
            fused_levels.append(
                fusion(
                    xl, batch["pairwise_affine"], agent_mask, train, **extra
                )
            )
        fused = self.backbone.decode(fused_levels, train)
        if self.shrink is not None:
            fused = self.shrink(fused, train)
        out = self.heads(fused)
        out.update(out_aux)
        return out


@register_model("heter_model_late")
class HeterModelLate(nn.Module):
    """Late-fusion heterogeneous model: one agent per sample, modality
    chosen by which inputs_mX block is present (ref heter_model_late.py).

    Norm default is GROUP norm, not batch: every sample runs through ALL
    modality branches (static shapes — inactive modalities get zero
    inputs, masked out afterwards via modality_flags), so train-mode
    BatchNorm would fold those zero canvases into the batch statistics
    of every branch. Group norm is per-sample and immune. Set
    ``norm: batch`` only for homogeneous batches.
    """

    args: Any

    def setup(self):
        a = self.args
        norm = a.get("norm", "group")
        self.modalities = modality_list(a)
        self.branches = {
            m: ModalityBranch(
                modality=m, cfg=a[m], norm=norm, name=f"branch_{m}"
            )
            for m in self.modalities
        }
        self.shrink = _shrink_from_args(a, norm)
        self.heads = DetectionHeads(
            anchor_number=a["anchor_number"],
            use_dir="dir_args" in a,
            num_bins=a.get("dir_args", {}).get("num_bins", 2),
            use_iou=a.get("use_iou", False),
            name="heads",
        )

    def __call__(self, batch: dict, train: bool = False):
        feats = []
        aux_all = {}
        target_hw = None
        flags = batch.get("modality_flags")  # (B, M), heter-late batches
        for m in lidar_first(self.modalities, self.args):
            k = self.modalities.index(m)  # modality_flags column order
            if f"inputs_{m}" not in batch:
                continue
            feat, aux = self.branches[m](batch[f"inputs_{m}"], train)
            if self.args[m].get("sensor_type", "lidar") == "camera":
                if target_hw is not None:
                    feat = center_crop_or_pad(feat, *target_hw)
            else:
                target_hw = feat.shape[1:3]
            if flags is not None:
                # zero out samples whose agent isn't this modality — the
                # padded zero inputs still produce BN-bias activations
                feat = feat * flags[:, k][:, None, None, None]
            feats.append(feat)
            if aux.get("depth_logits") is not None:
                aux_all[f"depth_items_{m}"] = aux["depth_logits"]
        assert feats, "no modality inputs present"
        feat = feats[0] if len(feats) == 1 else sum(feats)
        if self.shrink is not None:
            feat = self.shrink(feat, train)
        out = self.heads(feat)
        out.update(aux_all)
        return out
