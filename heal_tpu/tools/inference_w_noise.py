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

from ..config import load_yaml
from .inference import run_inference

NOISE_LEVELS = (0.0, 0.2, 0.4, 0.6)


def run_noise_sweep(
    model_dir: str,
    laplace: bool = False,
    levels=NOISE_LEVELS,
    max_batches=None,
):
    results = {}
    for std in levels:
        cfg = load_yaml("", model_dir=model_dir)
        noise = {
            "add_noise": std > 0,
            "args": {
                "pos_std": std,
                "rot_std": std,
                "pos_mean": 0,
                "rot_mean": 0,
                "laplace": laplace,
            },
        }
        res = run_inference(
            model_dir,
            note=f"noise_{'laplace' if laplace else 'gauss'}_{std}",
            max_batches=max_batches,
            noise_setting=noise,
        )
        results[std] = {k: v for k, v in res.items() if k.startswith("ap")}
        print(f"[noise {std}] {results[std]}")
    out_path = os.path.join(
        model_dir, f"ap_vs_noise_{'laplace' if laplace else 'gauss'}.json"
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    return results


def main(argv=None):
    p = argparse.ArgumentParser("heal_tpu inference_w_noise")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--laplace", action="store_true")
    p.add_argument("--max_batches", type=int, default=None)
    args = p.parse_args(argv)
    run_noise_sweep(args.model_dir, args.laplace, max_batches=args.max_batches)


if __name__ == "__main__":
    main()
