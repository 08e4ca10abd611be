"""AP-vs-epochs curve: evaluate every saved checkpoint of a run.

Companion to the reference's evaluation-as-test loop (train.py auto-runs
inference at the end; eval_utils dumps eval_*.yaml): walks a run dir's
``net_epoch{E}.ckpt`` files oldest-first, runs the standard AP evaluation
on each, and writes ``ap_curve.json`` — the learning-progress evidence
BASELINE.md records for the synthetic demo.

Usage:
    python -m heal_tpu.tools.ap_curve --model_dir runs/demo [--max_batches N]
"""
from __future__ import annotations

import argparse
import json
import os
import re

from . import checkpoint as ckpt_lib
from .inference import run_inference

_EPOCH_RE = re.compile(r"net_epoch(\d+)\.ckpt$")


def list_epoch_checkpoints(model_dir: str):
    """[(epoch, path)] sorted by epoch, excluding bestval duplicates."""
    out = []
    for f in os.listdir(model_dir):
        m = _EPOCH_RE.match(f)
        if m:
            out.append((int(m.group(1)), os.path.join(model_dir, f)))
    return sorted(out)


def run_curve(model_dir: str, max_batches=None) -> list:
    curve = []
    for epoch, path in list_epoch_checkpoints(model_dir):
        ckpt = ckpt_lib.load_checkpoint(path)
        res = run_inference(
            model_dir,
            params=ckpt["params"],
            batch_stats=ckpt.get("batch_stats", {}),
            note=f"epoch{epoch}",
            max_batches=max_batches,
        )
        row = {"epoch": epoch}
        row.update(
            {k: float(v) for k, v in res.items() if isinstance(v, (int, float))}
        )
        curve.append(row)
        print(f"[ap_curve] epoch {epoch}: "
              + " ".join(f"{k}={v:.3f}" for k, v in row.items() if k != "epoch"))
    out_path = os.path.join(model_dir, "ap_curve.json")
    with open(out_path, "w") as f:
        json.dump(curve, f, indent=1)
    print(f"[ap_curve] wrote {out_path}")
    return curve


def main(argv=None):
    p = argparse.ArgumentParser("heal_tpu ap_curve")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--max_batches", type=int, default=None)
    args = p.parse_args(argv)
    run_curve(args.model_dir, args.max_batches)


if __name__ == "__main__":
    main()
