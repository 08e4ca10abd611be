"""Inference + AP evaluation CLI.

Reference: tools/inference.py (:43-230) — load config + best checkpoint,
run the fusion-appropriate forward, decode to boxes, accumulate
AP@0.3/0.5/0.7 with the VOC matcher, dump eval yaml.
    python -m heal_tpu.tools.inference --model_dir runs/x [--range 102.4]
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from ..config import load_yaml
from ..data import build_dataset
from ..models import build_model
from ..postprocess.decode import (
    decode_stage2,
    fuse_and_nms,
    post_process_single,
    strip_padding,
)
from ..utils import box_np, eval_np
from ..utils.common import update_dict
from . import checkpoint as ckpt_lib


def run_inference(
    model_dir: str,
    override_range=None,
    note: str = "",
    max_batches: int | None = None,
    params=None,
    batch_stats=None,
    noise_setting=None,
    cfg_override=None,
    save_vis: bool = False,
    vis_interval: int = 40,
):
    cfg = load_yaml("", model_dir=model_dir)
    if noise_setting is not None:
        cfg["noise_setting"] = noise_setting
    if cfg_override:
        update_dict(cfg, cfg_override)
    if override_range is not None:
        r = override_range
        new_range = [-r[0], -r[1], -3, r[0], r[1], 1]
        update_dict(
            cfg,
            {
                "preprocess": {"cav_lidar_range": new_range},
                "postprocess": {
                    "gt_range": new_range,
                    "anchor_args": {"cav_lidar_range": new_range},
                },
            },
        )
        from ..config.loader import PARSER_REGISTRY

        cfg = PARSER_REGISTRY[cfg.get("yaml_parser", "load_general_params")](cfg)

    dataset = build_dataset(cfg, train=False)
    model = build_model(cfg["model"])

    if params is None:
        epoch, path = ckpt_lib.find_checkpoint(model_dir)
        assert path, f"no checkpoint in {model_dir}"
        ckpt = ckpt_lib.load_checkpoint(path)
        params, batch_stats = ckpt["params"], ckpt.get("batch_stats", {})
        print(f"[inference] loaded {path}")

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    def _forward(b):
        out = model.apply(variables, b, train=False)
        # static metadata (mode strings) can't cross the jit boundary
        return {k: v for k, v in out.items() if not isinstance(v, str)}

    infer = jax.jit(_forward)

    post = cfg["postprocess"]
    anchors = jnp.asarray(dataset.anchors)
    gt_range = jnp.asarray(post["gt_range"], dtype=jnp.float32)
    stat = eval_np.new_result_stat((0.3, 0.5, 0.7))

    # anchor-free models (CenterPoint family, PIXOR) mark their outputs;
    # the decoder is built lazily off the first forward so the flag comes
    # from the model itself, not a name heuristic
    _decode_cell: dict = {}

    def decode_one(*a, **k):
        if "fn" not in _decode_cell:
            _decode_cell["fn"] = jax.jit(
                partial(
                    post_process_single,
                    anchors=anchors,
                    gt_range=gt_range,
                    order=post["order"],
                    score_threshold=post["target_args"]["score_threshold"],
                    nms_threshold=post["nms_thresh"],
                    anchor_free=_decode_cell.get("anchor_free", False),
                )
            )
        return _decode_cell["fn"](*a, **k)
    merge = jax.jit(partial(fuse_and_nms, nms_threshold=post["nms_thresh"]))
    decode_two = jax.jit(
        partial(
            decode_stage2,
            gt_range=gt_range,
            score_threshold=post["target_args"]["score_threshold"],
            nms_threshold=post["nms_thresh"],
        )
    )
    late = cfg["fusion"]["core_method"] in ("late", "lateheter")

    def _decode_batch(out, t_matrix):
        if "fn" not in _decode_cell:
            _decode_cell["anchor_free"] = bool(
                np.asarray(out.get("anchor_free", False))
            )
        return decode_one(
            out["cls_preds"][0],
            out["reg_preds"][0],
            out["dir_preds"][0] if "dir_preds" in out else None,
            transformation_matrix=jnp.asarray(t_matrix),
        )

    def _infer_late(batch):
        """Per-agent forward -> project corners to ego -> cross-agent NMS
        (ref tools/inference_utils.py:18-47)."""
        from ..data.scene import collate

        dets = []
        ego = {
            k: v for k, v in batch.items() if k != "agent_samples"
        }
        out = infer(jax.tree.map(jnp.asarray, ego))
        dets.append(_decode_batch(out, batch["transformation_matrix"][0]))
        for s in batch.get("agent_samples", [[]])[0]:
            jb = jax.tree.map(jnp.asarray, collate([s]))
            out = infer(jb)
            dets.append(_decode_batch(out, s["transformation_matrix"]))
        return merge(
            [d["corners"] for d in dets],
            [d["scores"] for d in dets],
            [d["valid"] for d in dets],
        )

    n_batches = 0
    comm_rates = []
    dropped_agents = 0
    from ..data.prefetch import prefetch

    # camera depth RMSE (ref tools/inference_utils.py:190): per-modality
    # grid_conf for mapping bin indices back to metric depth
    depth_grid_confs = {}
    for m, setting in cfg.get("heter", {}).get(
        "modality_setting", {}
    ).items():
        if setting.get("sensor_type") == "camera" and "grid_conf" in setting:
            depth_grid_confs[m] = setting["grid_conf"]
    if "grid_conf" in cfg.get("model", {}).get("args", {}):
        depth_grid_confs[None] = cfg["model"]["args"]["grid_conf"]
    depth_sse: dict = {}

    def _accumulate_depth(out, batch):
        from ..utils import camera as cam_utils

        for k, v in out.items():
            if not k.startswith("depth_items"):
                continue
            m = k[len("depth_items_"):] or None
            gt = (
                batch.get(f"inputs_{m}", {}).get("depth_bins")
                if m
                else batch.get("depth_bins")
            )
            gc = depth_grid_confs.get(m) or depth_grid_confs.get(None)
            if gt is None or gc is None:
                continue
            sse, n = cam_utils.depth_metric(
                jax.device_get(v), gt, gc["ddiscr"], gc["mode"]
            )
            acc = depth_sse.setdefault(m or "", [0.0, 0])
            acc[0] += sse
            acc[1] += n

    # full test set on every host (AP must not depend on process count)
    for batch in prefetch(
        dataset.batches(1, shuffle=False, process_split=False)
    ):
        dropped_agents += int(
            np.sum(batch.get("dropped_agent_count", 0))
        )
        if late:
            det = _infer_late(batch)
        else:
            jbatch = jax.tree.map(jnp.asarray, batch)
            out = infer(jbatch)
            if "comm_rate" in out:  # where2comm bandwidth metric
                comm_rates.append(float(out["comm_rate"]))
            _accumulate_depth(out, batch)
            if "rcnn_cls" in out:
                # two-stage (FPV-RCNN): evaluate the REFINED collaborative
                # detections, not the per-agent stage-1 heads
                det = decode_two(
                    out["boxes_fused"][0],
                    out["valid_fused"][0],
                    out["rcnn_cls"][0],
                    out["rcnn_reg"][0],
                )
            else:
                det = _decode_batch(out, batch["transformation_matrix"][0])
        dense = strip_padding(jax.device_get(det))
        gt_mask = batch["gt_mask"][0] > 0
        gt_corners = box_np.boxes_to_corners_3d(
            batch["gt_boxes"][0][gt_mask], post["order"]
        )
        for t in (0.3, 0.5, 0.7):
            eval_np.calculate_tp_fp(
                dense["corners"], dense["scores"], gt_corners, stat, t
            )
        if save_vis and n_batches % vis_interval == 0:
            from ..visualization import visualize

            pts = batch.get("points")
            ego_pts = (
                pts[0, 0][batch["point_mask"][0, 0]]
                if pts is not None and pts.ndim == 4
                else (pts[0][batch["point_mask"][0]] if pts is not None else None)
            )
            visualize(
                dense["corners"],
                gt_corners,
                ego_pts,
                post["gt_range"],
                os.path.join(
                    model_dir, "vis", f"bev_{n_batches:05d}.png"
                ),
            )
        n_batches += 1
        if max_batches and n_batches >= max_batches:
            break

    result = eval_np.eval_final_results(
        stat, save_path=model_dir, infer_info=note or "intermediate"
    )
    if comm_rates:
        result["comm_rate"] = float(np.mean(comm_rates))
        print(f"[inference] comm_rate {result['comm_rate']:.4f}")
    for m, (sse, n) in sorted(depth_sse.items()):
        if n == 0:
            continue
        rmse = float(np.sqrt(sse / n))
        key = f"depth_rmse_{m}" if m else "depth_rmse"
        result[key] = rmse
        print(f"[inference] {key} {rmse:.4f} m over {n} px")
    result["dropped_agent_count"] = dropped_agents
    if dropped_agents:
        print(
            f"[inference] WARNING: {dropped_agents} in-range agent(s) "
            "left the collaboration because a per-modality packing "
            "capacity was exceeded (raise heter.modality_setting.mX."
            "max_agents or max_cav to keep them)"
        )
    return result


def main(argv=None):
    from ..utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser("heal_tpu inference")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--range", default=None, help="e.g. 102.4,102.4")
    p.add_argument("--note", default="")
    p.add_argument("--save_vis", action="store_true")
    args = p.parse_args(argv)
    override = (
        [float(x) for x in args.range.split(",")] if args.range else None
    )
    run_inference(
        args.model_dir, override, args.note, save_vis=args.save_vis
    )


if __name__ == "__main__":
    main()
