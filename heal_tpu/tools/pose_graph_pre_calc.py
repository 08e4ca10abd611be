"""Pre-compute per-frame single-view detections for CoAlign box alignment.

Reference: tools/pose_graph_pre_calc.py — run a stage-1 (single-agent)
detector over the dataset and dump per-frame, per-agent box centers (+
scores as uncertainty proxies) to JSON; the box_align data hook consumes
them to refine noisy poses before fusion.

    python -m heal_tpu.tools.pose_graph_pre_calc --model_dir runs/stage1 \
        [--out stage1_boxes.json]
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_yaml
from ..data import build_dataset
from ..models import build_model
from ..postprocess.decode import post_process_single, strip_padding
from . import checkpoint as ckpt_lib


def main(argv=None):
    p = argparse.ArgumentParser("heal_tpu pose_graph_pre_calc")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--max_frames", type=int, default=None)
    args = p.parse_args(argv)

    cfg = load_yaml("", model_dir=args.model_dir)
    # heter_* models consume the intermediate assembler's packed-modality
    # batch contract (inputs_mX/slots_mX/agent_mask); plain detectors take
    # raw padded point batches via the late-fusion layout
    heter = cfg["model"]["core_method"].startswith("heter")
    if not heter:
        cfg["fusion"]["core_method"] = "late"  # single-agent forwards
    dataset = build_dataset(cfg, train=False)
    model = build_model(cfg["model"])
    _, path = ckpt_lib.find_checkpoint(args.model_dir)
    ckpt = ckpt_lib.load_checkpoint(path)
    variables = {"params": ckpt["params"]}
    if ckpt.get("batch_stats"):
        variables["batch_stats"] = ckpt["batch_stats"]

    post = cfg["postprocess"]
    anchors = jnp.asarray(dataset.anchors)
    gt_range = jnp.asarray(post["gt_range"], dtype=jnp.float32)

    infer = jax.jit(
        lambda b: {
            k: v
            for k, v in model.apply(variables, b, train=False).items()
            if not isinstance(v, str)
        }
    )

    # one entry per scene agent, unfiltered and in scene order: the
    # box_align consumer (data/builder.py __getitem__) zips entries
    # against scene["agents"], so comm-range filtering or max_cav capping
    # here would silently shift detections onto the wrong agents
    pre = cfg["preprocess"]
    rng = pre["cav_lidar_range"]
    max_pts = pre["args"].get("max_points", 30000)

    def agent_frame(agent):
        p = np.asarray(agent["points"], np.float32)
        m = (
            (p[:, 0] >= rng[0]) & (p[:, 0] <= rng[3])
            & (p[:, 1] >= rng[1]) & (p[:, 1] <= rng[4])
            & (p[:, 2] >= rng[2]) & (p[:, 2] <= rng[5])
        )
        p = p[m][:max_pts]
        pts = np.zeros((max_pts, 4), np.float32)
        msk = np.zeros(max_pts, bool)
        # honor the sorted-scatter contract of presorted=True encoders
        pts[: len(p)] = dataset.assembler._presort(p[:, :4])
        msk[: len(p)] = True
        return pts, msk

    # heter path: each agent becomes a 1-agent scene (the agent is its own
    # ego) run through the dataset's assembler, so detections land in the
    # agent's own frame exactly like the raw-point path. The stage-1
    # detector is single-modality; every agent's raw points go through it
    # regardless of the alliance's nominal modality assignment.
    base_modality = dataset.modalities[0] if heter else None

    def heter_batch(agent, objects):
        one = {
            "agents": [dict(agent, modality=base_modality)],
            "objects": objects,
        }
        from ..data.scene import collate

        sample = dataset.assembler.assemble(one)
        return jax.tree.map(jnp.asarray, collate([sample], tuple(dataset.modalities)))

    results = {}
    for idx in range(len(dataset.backend)):
        if args.max_frames and idx >= args.max_frames:
            break
        scene = dataset.backend.scene(idx)
        per_agent = []
        for agent in scene["agents"]:
            if heter:
                jb = heter_batch(agent, scene["objects"])
            else:
                pts, msk = agent_frame(agent)
                jb = {
                    "points": jnp.asarray(pts)[None],
                    "point_mask": jnp.asarray(msk)[None],
                }
            out = infer(jb)
            det = post_process_single(
                out["cls_preds"][0],
                out["reg_preds"][0],
                out["dir_preds"][0] if "dir_preds" in out else None,
                anchors,
                jnp.eye(4),
                gt_range,
                order=post["order"],
                score_threshold=post["target_args"]["score_threshold"],
                nms_threshold=post["nms_thresh"],
                unc_preds=out["unc_preds"][0]
                if "unc_preds" in out
                else None,
            )
            dense = strip_padding(jax.device_get(det))
            entry = {
                "centers": dense["boxes"][:, :2].tolist(),
                "scores": dense["scores"].tolist(),
            }
            if "uncertainty" in dense:
                # (K, 3) log-var x/y + log-kappa yaw -> box-align weights
                # (ref pose_graph_pre_calc dumps uncertainty alongside)
                entry["uncertainty"] = dense["uncertainty"].tolist()
            per_agent.append(entry)
        results[str(idx)] = per_agent
    out_path = args.out or os.path.join(
        args.model_dir, "stage1_boxes.json"
    )
    with open(out_path, "w") as f:
        json.dump(results, f)
    print(f"[pose_graph_pre_calc] wrote {out_path} ({len(results)} frames)")


if __name__ == "__main__":
    main()
