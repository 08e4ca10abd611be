"""Pose-noise robustness sweep.

Reference: tools/inference_w_noise.py — run the eval loop with Gaussian
(and optionally Laplace) localization noise at pos/rot std in
{0, 0.2, 0.4, 0.6}, reporting AP per noise level.

    python -m heal_tpu.tools.inference_w_noise --model_dir runs/x
"""
from __future__ import annotations

import argparse
import json
import os

from .inference import run_inference

NOISE_LEVELS = (0.0, 0.2, 0.4, 0.6)


def run_noise_sweep(
    model_dir: str,
    laplace: bool = False,
    levels=NOISE_LEVELS,
    max_batches=None,
    box_align_precalc: str | None = None,
    von_mises: bool = False,
):
    """AP per pose-noise level; with ``box_align_precalc`` (a
    pose_graph_pre_calc dump) the sweep also runs CoAlign pose
    refinement, demonstrating AP recovery under localization error
    (ref tools/inference_w_noise.py + box_align_v2 consumption in
    intermediate_heter_fusion_dataset.py:372-399)."""
    dist_name = (
        "laplace" if laplace else "vonmises" if von_mises else "gauss"
    )
    results = {}
    for std in levels:
        noise = {
            "add_noise": std > 0,
            "args": {
                "pos_std": std,
                "rot_std": std,
                "pos_mean": 0,
                "rot_mean": 0,
                "laplace": laplace,
                "von_mises": von_mises,
            },
        }
        tag = f"noise_{dist_name}_{std}"
        override = None
        if box_align_precalc:
            override = {"box_align": {"precalc_path": box_align_precalc}}
            tag += "_boxalign"
        res = run_inference(
            model_dir,
            note=tag,
            max_batches=max_batches,
            noise_setting=noise,
            cfg_override=override,
        )
        results[std] = {k: v for k, v in res.items() if k.startswith("ap")}
        print(f"[noise {std}{' +align' if box_align_precalc else ''}] "
              f"{results[std]}")
    out_path = os.path.join(
        model_dir,
        f"ap_vs_noise_{dist_name}"
        f"{'_boxalign' if box_align_precalc else ''}.json",
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    return results


def main(argv=None):
    p = argparse.ArgumentParser("heal_tpu inference_w_noise")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--laplace", action="store_true")
    p.add_argument("--von_mises", action="store_true",
                   help="Gaussian position + von-Mises yaw noise "
                        "(ref pose_utils.generate_noise_torch)")
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--box_align", default=None, metavar="PRECALC_JSON",
                   help="pose_graph_pre_calc dump; enables CoAlign pose "
                        "refinement during the sweep")
    args = p.parse_args(argv)
    run_noise_sweep(args.model_dir, args.laplace,
                    max_batches=args.max_batches,
                    box_align_precalc=args.box_align,
                    von_mises=args.von_mises)


if __name__ == "__main__":
    main()
