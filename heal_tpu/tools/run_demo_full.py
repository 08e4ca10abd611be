"""Run the FLAGSHIP-scale HEAL open-heterogeneity protocol end to end.

Counterpart of the reference's full workflow (yifanlu0227/HEAL README
"Train the HEAL" + tools/inference_heter_in_order.py): stage-1 m1 base,
three stage-2 agent types (camera LSS, SECOND, 16-line pillars) trained
against the FROZEN base, pytree merge, then the merged-alliance
evaluations — plain AP, in-order k=1..4 open heterogeneity, and the
pose-noise sweep (optionally with CoAlign box alignment).

Phases are idempotent: a phase is skipped when its artifact already
exists, so the pipeline resumes after interruption.

    python -m heal_tpu.tools.run_demo_full --out runs/demo_full
"""
from __future__ import annotations

import argparse
import json
import os
import re
import time

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "demo_heal_full")


def _ckpt(d):
    from . import checkpoint as ck

    if not os.path.isdir(d):
        return None
    _, path = ck.find_checkpoint(d)
    return path


def _trained(d, epochs_override=None):
    """True when the run dir holds a checkpoint at the configured final
    epoch — a mid-run checkpoint means "resume", not "done"."""
    from . import checkpoint as ck
    from ..config import load_yaml

    if not os.path.isdir(d):
        return False
    # find_checkpoint prefers bestval (often < final epoch); completion is
    # judged on the highest numbered epoch checkpoint
    eps = [
        int(m.group(1))
        for m in (
            re.fullmatch(r"net_epoch(\d+)\.ckpt", n) for n in os.listdir(d)
        )
        if m
    ]
    if not eps:
        return False
    cfg = load_yaml("", model_dir=d)
    want = epochs_override or cfg["train_params"]["epoches"]
    return max(eps) >= want


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="runs/demo_full")
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--stage1_epochs", type=int, default=None)
    p.add_argument("--stage2_epochs", type=int, default=None)
    p.add_argument(
        "--cfg_dir", default=CFG,
        help="config directory (e.g. configs/demo_heal_bench)",
    )
    p.add_argument(
        "--modalities", default="m2,m3,m4",
        help="stage-2 agent types to train (csv)",
    )
    p.add_argument(
        "--final_cfg", default="final_m1m2m3m4",
        help="merged-alliance config name in cfg_dir",
    )
    p.add_argument(
        "--skip_noise", action="store_true",
        help="skip the pose-noise + box-align legs",
    )
    args = p.parse_args(argv)
    cfg_dir = args.cfg_dir

    from .inference import run_inference
    from .inference_heter_in_order import run_in_order
    from .inference_w_noise import run_noise_sweep
    from .merge import merge_final
    from .train import main as train_main

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()

    def log(msg):
        print(f"[demo_full +{time.time() - t0:7.0f}s] {msg}", flush=True)

    # ---- stage 1: m1 collaboration base
    stage1 = os.path.join(args.out, "stage1_m1")
    if not _trained(stage1, args.stage1_epochs):
        log("stage 1: training m1 base")
        argv1 = ["-y", os.path.join(cfg_dir, "stage1_m1.yaml"),
                 "--model_dir", stage1, "--no_final_inference"]
        if args.stage1_epochs:
            argv1 += ["--epochs", str(args.stage1_epochs)]
        train_main(argv1)
    s1_path = _ckpt(stage1)
    log(f"stage 1 ready: {s1_path}")

    # ---- stage 2: each new agent type against the frozen base
    stage2_dirs = []
    for m in args.modalities.split(","):
        m = m.strip()
        d = os.path.join(args.out, f"stage2_{m}")
        if not _trained(d, args.stage2_epochs):
            log(f"stage 2: training {m} single against frozen base")
            argv2 = ["-y", os.path.join(cfg_dir, f"stage2_{m}.yaml"),
                     "--model_dir", d, "--no_final_inference",
                     "--init_from", s1_path]
            if args.stage2_epochs:
                argv2 += ["--epochs", str(args.stage2_epochs)]
            train_main(argv2)
        stage2_dirs.append(d)
        log(f"stage 2 {m} ready")

    # ---- stage 3: merge into the open alliance
    merged = os.path.join(args.out, "merged_alliance")
    if not os.path.exists(os.path.join(merged, "config.yaml")):
        log("stage 3: merging checkpoints")
        merge_final(stage2_dirs, stage1, merged)
        from ..config import load_yaml, save_yaml

        final_cfg = load_yaml(os.path.join(cfg_dir, f"{args.final_cfg}.yaml"))
        save_yaml(final_cfg, os.path.join(merged, "config.yaml"))
    log("merged alliance ready")

    results = {}

    # ---- merged-alliance AP
    tagf = os.path.join(merged, "eval_merged.json")
    if not os.path.exists(tagf):
        log("eval: merged alliance inference")
        res = run_inference(merged, note="merged",
                            max_batches=args.max_batches)
        res = {k: v for k, v in res.items()
               if isinstance(v, (int, float, str))}
        with open(tagf, "w") as f:
            json.dump(res, f, indent=2)
    results["merged"] = json.load(open(tagf))
    log(f"merged AP: { {k: v for k, v in results['merged'].items() if k.startswith('ap')} }")

    # ---- open-heterogeneity in-order table (k = 1..4)
    tagf = os.path.join(merged, "ap_in_order.json")
    if not os.path.exists(tagf):
        log("eval: in-order k=1..4")
        run_in_order(merged, max_batches=args.max_batches)
    results["in_order"] = json.load(open(tagf))

    # ---- pose-noise sweep on the merged alliance
    if args.skip_noise:
        with open(os.path.join(args.out, "demo_full_results.json"), "w") as f:
            json.dump(results, f, indent=2)
        log("DONE (noise legs skipped)")
        print(json.dumps(results, indent=2))
        return results
    tagf = os.path.join(merged, "ap_vs_noise_gauss.json")
    if not os.path.exists(tagf):
        log("eval: pose-noise sweep (gaussian)")
        run_noise_sweep(merged, max_batches=args.max_batches)
    results["noise"] = json.load(open(tagf))

    # ---- CoAlign: box-aligned noise sweep (stage-1 detection dump)
    precalc = os.path.join(stage1, "stage1_boxes.json")
    try:
        if not os.path.exists(precalc):
            log("eval: pose_graph_pre_calc on the stage-1 model")
            from .pose_graph_pre_calc import main as precalc_main

            precalc_main(["--model_dir", stage1, "--out", precalc])
        tagf = os.path.join(merged, "ap_vs_noise_gauss_boxalign.json")
        if not os.path.exists(tagf):
            log("eval: pose-noise sweep + box align")
            run_noise_sweep(merged, max_batches=args.max_batches,
                            box_align_precalc=precalc)
        results["noise_boxalign"] = json.load(open(tagf))
    except Exception as e:  # noqa: BLE001 — record, don't lose the table
        log(f"box-align leg failed: {e!r}")
        results["noise_boxalign"] = {"error": repr(e)}

    with open(os.path.join(args.out, "demo_full_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    log("DONE")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
