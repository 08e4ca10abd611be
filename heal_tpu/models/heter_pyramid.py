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
import numpy as np

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


def lidar_first(modalities, args: dict):
    """Order lidar modalities before camera ones: the lidar grid defines
    the BEV canvas size that camera features are center-cropped to, so a
    camera modality processed first would silently set the wrong canvas
    (or skip its crop entirely)."""
    return sorted(
        modalities,
        key=lambda m: args[m].get("sensor_type", "lidar") == "camera",
    )


def center_crop_or_pad(feat: jnp.ndarray, th: int, tw: int) -> jnp.ndarray:
    """Center crop/zero-pad (N, H, W, C) to (N, th, tw, C).

    Equivalent of the reference's torchvision CenterCrop on camera BEV
    features (heter_pyramid_collab.py:153-167) — with a camera grid
    smaller than the lidar range this PADS with zeros.
    """
    n, h, w, c = feat.shape
    if h > th:
        start = (h - th) // 2
        feat = feat[:, start : start + th]
    elif h < th:
        pad = th - h
        feat = jnp.pad(feat, ((0, 0), (pad // 2, pad - pad // 2), (0, 0), (0, 0)))
    n, h, w, c = feat.shape
    if w > tw:
        start = (w - tw) // 2
        feat = feat[:, :, start : start + tw]
    elif w < tw:
        pad = tw - w
        feat = jnp.pad(feat, ((0, 0), (0, 0), (pad // 2, pad - pad // 2), (0, 0)))
    return feat


def camera_fov_mask(h: int, w: int, crop_ratio_h: float, crop_ratio_w: float):
    """(h, w, 1) mask: 1 inside the camera-covered central region, 0 in
    the zero-padded border (minus a 4-pixel guard band, as the reference's
    eval-time crop mask, pyramid_fuse.py:147-162)."""
    vis_h = min(h, int(h / crop_ratio_h) - 4)
    vis_w = min(w, int(w / crop_ratio_w) - 4)
    mask = np.zeros((h, w, 1), np.float32)
    y0 = (h - vis_h) // 2
    x0 = (w - vis_w) // 2
    mask[y0 : y0 + vis_h, x0 : x0 + vis_w] = 1.0
    return jnp.asarray(mask)


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
                    presorted=enc_args.get("presorted", False),
                )
            elif c["core_method"] == "second":
                from .second import SecondEncoder

                sec = enc_args.get("second", {})
                kw = {}
                if "channels" in sec:
                    kw["channels"] = tuple(sec["channels"])
                if "max_voxels" in sec:
                    kw["max_voxels"] = tuple(sec["max_voxels"])
                self.encoder = SecondEncoder(
                    voxel_size=tuple(enc_args["voxel_size"]),
                    lidar_range=tuple(enc_args["lidar_range"]),
                    norm=self.norm,
                    presorted=enc_args.get("presorted", False),
                    **kw,
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
        axis. Returns ((N_packed, h, w, C) aligned BEV features, aux)."""
        aux = {}
        if self.cfg.get("sensor_type", "lidar") == "camera":
            feat, depth_logits = self.encoder(inputs, train)
            aux["depth_logits"] = depth_logits
        else:  # lidar encoders share the (points, mask) interface
            feat = self.encoder(inputs["points"], inputs["point_mask"], train)
        feat = self.backbone(feat, train)
        return self.aligner(feat, train), aux


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
            use_iou=a.get("use_iou", False),
            name="heads",
        )
        if "compressor" in a:
            comp = a["compressor"]
            if comp.get("core_method", "naive") == "autoencoder":
                from .layers import AutoEncoder

                self.compressor = AutoEncoder(
                    feature_num=comp["input_dim"],
                    layer_num=comp.get("layer_num", 1),
                    norm=norm,
                )
            else:
                self.compressor = NaiveCompressor(
                    input_dim=comp["input_dim"],
                    compress_ratio=comp["compress_ratio"],
                    norm=norm,
                )
        else:
            self.compressor = None

    @property
    def fix_modules(self):
        """Compressor finetuning freezes everything else (reference
        model_train_init, heter_pyramid_collab.py:121-131)."""
        if "compressor" not in self.args:
            return ()
        return tuple(
            f"branch_{m}" for m in modality_list(self.args)
        ) + ("pyramid_backbone", "shrink", "heads")

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
        # frozen modules (compressor finetuning) run in eval mode so their
        # BN uses and keeps the pretrained running stats (ref fix_bn)
        frozen = set(self.fix_modules) if train else set()

        # lidar grid at the collaboration stride defines the target dims
        lidar_range = a["lidar_range"]

        feat_all = None
        out_aux = {}
        cam_mask_by_modality = {}
        for m in self.modalities:
            if f"inputs_{m}" not in batch:
                continue
            inputs = batch[f"inputs_{m}"]
            lead = jax.tree.leaves(inputs)[0]
            lm = lead.shape[1]
            flat = jax.tree.map(
                lambda x: x.reshape((b * lm,) + x.shape[2:]), inputs
            )
            feat, aux = self.branches[m](
                flat, train and f"branch_{m}" not in frozen
            )  # (B*L_m, h, w, C)
            if aux.get("depth_logits") is not None:
                out_aux[f"depth_items_{m}"] = aux["depth_logits"]
            if a[m].get("sensor_type", "lidar") == "camera":
                # pad/crop camera BEV to the lidar grid + remember FOV
                gc = a[m]["encoder_args"]["grid_conf"]
                ratio_w = lidar_range[3] / gc["xbound"][1]
                ratio_h = lidar_range[4] / gc["ybound"][1]
                if feat_all is not None:
                    th, tw = feat_all.shape[2], feat_all.shape[3]
                else:
                    # same spatial stride as the camera branch's own grid
                    scale_h = (lidar_range[4] - lidar_range[1]) / (
                        gc["ybound"][1] - gc["ybound"][0]
                    )
                    scale_w = (lidar_range[3] - lidar_range[0]) / (
                        gc["xbound"][1] - gc["xbound"][0]
                    )
                    th = int(round(feat.shape[1] * scale_h))
                    tw = int(round(feat.shape[2] * scale_w))
                feat = center_crop_or_pad(feat, th, tw)
                cam_mask_by_modality[m] = (ratio_h, ratio_w)
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

        # eval-time camera-FOV score masks per pyramid level
        crop_mask_list = None
        if not train and cam_mask_by_modality:
            h, w = feat_all.shape[2], feat_all.shape[3]
            strides = np.cumprod(a["fusion_backbone"]["layer_strides"])
            crop_mask_list = []
            for s in strides:
                hl, wl = h // int(s), w // int(s)
                level = jnp.ones((b, l + 1, hl, wl, 1), feat_all.dtype)
                for m, (rh, rw) in cam_mask_by_modality.items():
                    mask = camera_fov_mask(hl, wl, rh, rw).astype(
                        feat_all.dtype
                    )
                    level = jax.vmap(
                        lambda lv, slots: lv.at[slots].set(mask)
                    )(level, batch[f"slots_{m}"])
                crop_mask_list.append(level[:, :l])

        fused, occ_list = self.pyramid_backbone.forward_collab(
            feat_all,
            batch["pairwise_affine"],
            agent_mask,
            crop_mask_list=crop_mask_list,
            train=train and "pyramid_backbone" not in frozen,
        )
        if self.shrink is not None:
            fused = self.shrink(fused, train and "shrink" not in frozen)
        out = self.heads(fused)
        out["pyramid"] = "collab"
        out["occ_single_list"] = occ_list
        out.update(out_aux)
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
            use_iou=a.get("use_iou", False),
            name="heads",
        )

    def __call__(self, batch: dict, train: bool = False):
        inputs = batch[f"inputs_{self.modality}"]
        lead = jax.tree.leaves(inputs)[0]
        if lead.ndim > 2 and "agent_mask" in batch:
            # batched (B, L_m, ...) packing -> flatten agents
            b, lm = lead.shape[:2]
            inputs = jax.tree.map(
                lambda x: x.reshape((b * lm,) + x.shape[2:]), inputs
            )
        feat, aux = self.branch(inputs, train)
        # frozen modules run in eval mode even during stage-2 training:
        # BN uses the stage-1 running stats and never updates them
        # (reference fix_bn, utils/model_utils.py:9-16 +
        # heter_pyramid_single.py:74-96)
        fused, occ_list = self.pyramid_backbone.forward_single(feat, False)
        if self.shrink is not None:
            fused = self.shrink(fused, False)
        out = self.heads(fused)
        out["pyramid"] = "single"
        out["occ_single_list"] = occ_list
        if aux.get("depth_logits") is not None:
            out[f"depth_items_{self.modality}"] = aux["depth_logits"]
        return out
