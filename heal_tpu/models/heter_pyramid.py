"""HEAL heterogeneous pyramid models.

Capability parity with reference models/heter_pyramid_collab.py and
heter_pyramid_single.py: per-modality encoder -> per-modality BEV backbone
-> aligner -> (camera center-crop) -> Pyramid Fusion collaboration ->
shrink conv -> cls/reg/dir heads. Stage semantics:
  * stage 1: collab model trained on the base modality;
  * stage 2: HeterPyramidSingle per new modality with
    pyramid/shrink/heads FROZEN (here: optimizer masking via
    ``fix_modules``, see parallel/freezing.py — replaces requires_grad
    surgery);
  * stage 3: checkpoint merge = parameter pytree union (tools/merge.py).

TPU-first batching: agents are packed per modality on the host —
``inputs_mX`` arrays have a fixed per-modality agent capacity and
``slots_mX`` maps each packed agent to its global slot in the (B, L) agent
dimension (-? padded entries point at a dump slot L). This replaces the
reference's ragged per-modality input_list re-assembly
(intermediate_heter_fusion_dataset.py:414-439, heter_pyramid_collab.py:172).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .aligner import AlignNet
from .encoders import PointPillarEncoder
from .heads import DetectionHeads
from .layers import NaiveCompressor
from .point_pillar import _shrink_from_args
from .registry import register_model
from .resnet_bev import ResNetBEVBackbone
from .fuse.pyramid import PyramidFusion

MODALITY_KEYS = ("m1", "m2", "m3", "m4")


def modality_list(args: dict):
    return [m for m in MODALITY_KEYS if m in args]


class ModalityBranch(nn.Module):
    """encoder -> backbone -> aligner for one agent type (sensor+net)."""

    modality: str
    cfg: Any
    norm: str = "batch"

    def setup(self):
        c = self.cfg
        enc_args = c["encoder_args"]
        if c.get("sensor_type", "lidar") == "lidar":
            if c["core_method"] == "point_pillar":
                self.encoder = PointPillarEncoder(
                    voxel_size=tuple(enc_args["voxel_size"]),
                    lidar_range=tuple(enc_args["lidar_range"]),
                    num_filters=tuple(
                        enc_args["pillar_vfe"]["num_filters"]
                    ),
                    use_absolute_xyz=enc_args["pillar_vfe"].get(
                        "use_absolute_xyz", True
                    ),
                    with_distance=enc_args["pillar_vfe"].get(
                        "with_distance", False
                    ),
                    norm=self.norm,
                )
            elif c["core_method"] == "second":
                from .second import SecondEncoder

                self.encoder = SecondEncoder(
                    voxel_size=tuple(enc_args["voxel_size"]),
                    lidar_range=tuple(enc_args["lidar_range"]),
                    norm=self.norm,
                )
            else:
                raise KeyError(
                    f"unknown lidar encoder {c['core_method']!r}"
                )
        else:
            from .lift_splat_shoot import LiftSplatShootEncoder

            self.encoder = LiftSplatShootEncoder(
                args=enc_args, norm=self.norm
            )
        bb = c["backbone_args"]
        self.backbone = ResNetBEVBackbone(
            layer_nums=tuple(bb["layer_nums"]),
            layer_strides=tuple(bb["layer_strides"]),
            num_filters=tuple(bb["num_filters"]),
            upsample_strides=tuple(bb.get("upsample_strides", ())),
            num_upsample_filter=tuple(bb.get("num_upsample_filter", ())),
            norm=self.norm,
        )
        self.aligner = AlignNet(
            args=c.get("aligner_args", {"core_method": "identity"}),
            dim=bb["num_filters"][-1],
            norm=self.norm,
        )

    def __call__(self, inputs: dict, train: bool = False):
        """inputs: modality-packed sensor arrays with a leading flat agent
        axis. Returns (N_packed, h, w, C) aligned BEV features."""
        if isinstance(self.encoder, PointPillarEncoder):
            feat = self.encoder(inputs["points"], inputs["point_mask"], train)
        else:
            feat = self.encoder(inputs, train)
        feat = self.backbone(feat, train)
        return self.aligner(feat, train)


@register_model("heter_pyramid_collab")
class HeterPyramidCollab(nn.Module):
    """args: per-modality blocks (m1..m4) + fusion_backbone + shrink_header
    + anchor_number + dir_args (+ compressor)."""

    args: Any

    def setup(self):
        a = self.args
        norm = a.get("norm", "batch")
        self.modalities = modality_list(a)
        self.branches = {
            m: ModalityBranch(modality=m, cfg=a[m], norm=norm, name=f"branch_{m}")
            for m in self.modalities
        }
        self.pyramid_backbone = PyramidFusion(
            args=a["fusion_backbone"], norm=norm, name="pyramid_backbone"
        )
        self.shrink = _shrink_from_args(a, norm)
        self.heads = DetectionHeads(
            anchor_number=a["anchor_number"],
            use_dir="dir_args" in a,
            num_bins=a.get("dir_args", {}).get("num_bins", 2),
            name="heads",
        )
        if "compressor" in a:
            self.compressor = NaiveCompressor(
                input_dim=a["compressor"]["input_dim"],
                compress_ratio=a["compressor"]["compress_ratio"],
                norm=norm,
            )
        else:
            self.compressor = None

    def __call__(self, batch: dict, train: bool = False):
        """batch:
          inputs_mX : dict of modality-packed arrays (B, L_m, ...)
          slots_mX : (B, L_m) int32 per-sample agent slot (dump slot = L)
          agent_mask : (B, L) bool
          pairwise_affine : (B, L, L, 2, 3)
          (optional) crop_mask_list for camera FOV masking at eval
        All arrays are batch-major -> shardable over a data mesh axis.
        """
        a = self.args
        agent_mask = batch["agent_mask"]
        b, l = agent_mask.shape

        feat_all = None
        for m in self.modalities:
            if f"inputs_{m}" not in batch:
                continue
            inputs = batch[f"inputs_{m}"]
            lm = inputs["points"].shape[1] if "points" in inputs else l
            flat = jax.tree.map(
                lambda x: x.reshape((b * lm,) + x.shape[2:]), inputs
            )
            feat = self.branches[m](flat, train)  # (B*L_m, h, w, C)
            feat = feat.reshape((b, lm) + feat.shape[1:])
            if feat_all is None:
                h, w, c = feat.shape[2:]
                feat_all = jnp.zeros((b, l + 1, h, w, c), feat.dtype)
            # per-sample scatter into global agent slots
            feat_all = jax.vmap(
                lambda canvas, slots, f: canvas.at[slots].add(f)
            )(feat_all, batch[f"slots_{m}"], feat)
        assert feat_all is not None, "no modality inputs in batch"
        feat_all = feat_all[:, :l]

        if self.compressor is not None:
            flat = feat_all.reshape((b * l,) + feat_all.shape[2:])
            feat_all = self.compressor(flat, train).reshape(feat_all.shape)

        fused, occ_list = self.pyramid_backbone.forward_collab(
            feat_all,
            batch["pairwise_affine"],
            agent_mask,
            crop_mask_list=batch.get("crop_mask_list"),
            train=train,
        )
        if self.shrink is not None:
            fused = self.shrink(fused, train)
        out = self.heads(fused)
        out["pyramid"] = "collab"
        out["occ_single_list"] = occ_list
        return out


@register_model("heter_pyramid_single")
class HeterPyramidSingle(nn.Module):
    """Stage-2 per-agent-type training model (single modality, no fusion).

    ``fix_modules`` (pyramid_backbone, shrink, heads) are shared with the
    stage-1 checkpoint and frozen by the trainer.
    """

    args: Any
    fix_modules = ("pyramid_backbone", "shrink", "heads")

    def setup(self):
        a = self.args
        norm = a.get("norm", "batch")
        mods = modality_list(a)
        assert len(mods) == 1, "heter_pyramid_single expects one modality"
        self.modality = mods[0]
        self.branch = ModalityBranch(
            modality=self.modality,
            cfg=a[self.modality],
            norm=norm,
            name=f"branch_{self.modality}",
        )
        self.pyramid_backbone = PyramidFusion(
            args=a["fusion_backbone"], norm=norm, name="pyramid_backbone"
        )
        self.shrink = _shrink_from_args(a, norm)
        self.heads = DetectionHeads(
            anchor_number=a["anchor_number"],
            use_dir="dir_args" in a,
            num_bins=a.get("dir_args", {}).get("num_bins", 2),
            name="heads",
        )

    def __call__(self, batch: dict, train: bool = False):
        feat = self.branch(batch[f"inputs_{self.modality}"], train)
        fused, occ_list = self.pyramid_backbone.forward_single(feat, train)
        if self.shrink is not None:
            fused = self.shrink(fused, train)
        out = self.heads(fused)
        out["pyramid"] = "single"
        out["occ_single_list"] = occ_list
        return out
