"""Open-heterogeneity evaluation: add agent types in order.

Reference: tools/inference_heter_in_order.py — evaluate the merged HEAL
model as agent types join one by one (m1 -> m1m2 -> m1m2m3 -> m1m2m3m4):
mapping_dict forced to identity, comm_range raised to 180, eval range
204.8 x 102.4, the first k agents collaborate while GT comes from all;
optional lidar degradation ({m1: 32, m3: 16} line counts).

    python -m heal_tpu.tools.inference_heter_in_order --model_dir runs/x
"""
from __future__ import annotations

import argparse
import json
import os

from ..config import load_yaml
from .inference import run_inference


def run_in_order(
    model_dir: str,
    lidar_degrade: dict | None = None,
    comm_range: float = 180.0,
    max_batches=None,
):
    cfg = load_yaml("", model_dir=model_dir)
    heter = cfg.get("heter") or {}
    modality_order = sorted((heter.get("modality_setting") or {"m1": {}}).keys())
    results = {}
    for k in range(1, len(modality_order) + 1):
        # the FIRST k agents collaborate (GT stays scene-wide) with the
        # in-order modality assignment — reference heter-infer semantics
        # (intermediate_heter_infer_fusion_dataset.py:41-60), not a
        # modality filter
        override = {
            "comm_range": comm_range,
            "heter": {
                "mapping_dict": {m: m for m in modality_order},
                "use_cav": k,
            },
        }
        if lidar_degrade:
            override["heter"]["lidar_channels_dict"] = lidar_degrade
        tag = "".join(modality_order[:k])
        res = run_inference(
            model_dir,
            note=f"in_order_{tag}",
            max_batches=max_batches,
            cfg_override=override,
        )
        results[tag] = {
            key: v for key, v in res.items() if key.startswith("ap")
        }
        print(f"[in-order k={k}] {results[tag]}")
    with open(os.path.join(model_dir, "ap_in_order.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results


def main(argv=None):
    p = argparse.ArgumentParser("heal_tpu inference_heter_in_order")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--degrade", default=None,
                   help="e.g. 'm1:32,m3:16' lidar line degradation")
    p.add_argument("--max_batches", type=int, default=None)
    args = p.parse_args(argv)
    degrade = None
    if args.degrade:
        degrade = {
            kv.split(":")[0]: int(kv.split(":")[1])
            for kv in args.degrade.split(",")
        }
    run_in_order(args.model_dir, degrade, max_batches=args.max_batches)


if __name__ == "__main__":
    main()
