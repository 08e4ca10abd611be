"""Evaluate CoAlign pose-graph refinement quality.

Reference: tools/pose_graph_evaluate.py — load the stage-1 detection dump
(tools/pose_graph_pre_calc), inject pose noise at several stds, run
box-alignment, and report translation/rotation error distributions
before vs after refinement.

    python -m heal_tpu.tools.pose_graph_evaluate --model_dir runs/stage1 \
        [--precalc stage1_boxes.json] [--stds 0.2,0.4,0.6]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ..config import load_yaml
from ..data import build_dataset
from ..utils.box_align import box_alignment_relative
from ..utils.pose_noise import add_pose_noise


def _pose_errors(poses, clean):
    """Per-agent trans (m) / rot (deg) errors, ego (agent 0) excluded."""
    poses = np.asarray(poses, dtype=np.float64)
    clean = np.asarray(clean, dtype=np.float64)
    trans = np.linalg.norm(poses[1:, :2] - clean[1:, :2], axis=1)
    dyaw = np.abs(poses[1:, 4] - clean[1:, 4]) % 360.0
    rot = np.minimum(dyaw, 360.0 - dyaw)
    return trans.tolist(), rot.tolist()


def evaluate(
    model_dir: str,
    precalc_path: str | None = None,
    stds=(0.2, 0.4, 0.6),
    max_frames: int | None = None,
    seed: int = 303,
):
    cfg = load_yaml("", model_dir=model_dir)
    dataset = build_dataset(cfg, train=False)
    precalc_path = precalc_path or os.path.join(
        model_dir, "stage1_boxes.json"
    )
    with open(precalc_path) as f:
        precalc = json.load(f)

    report = {}
    for std in stds:
        np.random.seed(seed)  # add_pose_noise draws from global numpy
        errs = {k: [] for k in ("trans_noisy", "rot_noisy",
                                "trans_refined", "rot_refined")}
        n_frames = 0
        for idx in range(len(dataset)):
            if max_frames and n_frames >= max_frames:
                break
            entry = precalc.get(str(idx))
            if not entry:
                continue
            scene = dataset.backend.scene(idx)
            clean = [np.asarray(a["pose"], np.float64)
                     for a in scene["agents"]]
            if len(clean) < 2:
                continue
            noise_args = {
                "pos_std": std, "rot_std": std,
                "pos_mean": 0.0, "rot_mean": 0.0,
            }
            noisy = add_pose_noise(clean, noise_args)
            centers = [np.asarray(e["centers"]) for e in entry]
            centers = centers[: len(clean)]
            if any(len(c) == 0 for c in centers):
                continue
            uncert = None
            if all("uncertainty" in e and len(e["uncertainty"])
                   for e in entry[: len(clean)]):
                from ..utils.box_align import uncertainty_to_weights

                uncert = [
                    uncertainty_to_weights(e["uncertainty"])
                    for e in entry[: len(clean)]
                ]
            refined = box_alignment_relative(
                centers, np.stack(noisy), uncertainties=uncert
            )
            t, r = _pose_errors(noisy, clean)
            errs["trans_noisy"] += t
            errs["rot_noisy"] += r
            t, r = _pose_errors(refined, clean)
            errs["trans_refined"] += t
            errs["rot_refined"] += r
            n_frames += 1
        report[str(std)] = {
            k: {
                "mean": float(np.mean(v)) if v else None,
                "median": float(np.median(v)) if v else None,
            }
            for k, v in errs.items()
        }
        if errs["trans_noisy"]:
            print(
                f"[pose_graph_evaluate] std={std}: trans "
                f"{np.mean(errs['trans_noisy']):.3f} -> "
                f"{np.mean(errs['trans_refined']):.3f} m, rot "
                f"{np.mean(errs['rot_noisy']):.3f} -> "
                f"{np.mean(errs['rot_refined']):.3f} deg "
                f"({n_frames} frames)"
            )
    out_path = os.path.join(model_dir, "pose_graph_eval.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[pose_graph_evaluate] wrote {out_path}")
    return report


def main(argv=None):
    p = argparse.ArgumentParser("heal_tpu pose_graph_evaluate")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--precalc", default=None)
    p.add_argument("--stds", default="0.2,0.4,0.6")
    p.add_argument("--max_frames", type=int, default=None)
    args = p.parse_args(argv)
    evaluate(
        args.model_dir,
        args.precalc,
        tuple(float(s) for s in args.stds.split(",")),
        args.max_frames,
    )


if __name__ == "__main__":
    main()
