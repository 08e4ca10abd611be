"""HEAL stage-3 checkpoint merging CLI.

Reference: tools/heal_tools.py — ``merge_final`` finds each agent-type
run's best checkpoint and unions the state dicts (dropping the per-type
single heads so the collaboration base's heads win, :92-103). Here
checkpoints are parameter pytrees, so the merge is a recursive dict union
(tools/checkpoint.merge_checkpoints); the base model's entries win by
being merged last.

    python -m heal_tpu.tools.merge merge_final m2_dir m3_dir m4_dir \
        m1_base_dir output_dir
"""
from __future__ import annotations

import argparse
import os
import shutil

from . import checkpoint as ckpt_lib

# per-agent-type training also trains these shared modules' names; the
# collaboration base must win for them (reference drops cls/reg/dir heads
# + pyramid from the non-base dicts)
DROP_FROM_NEW_TYPES = ("pyramid_backbone", "shrink", "heads")


def best_ckpt(model_dir: str) -> str:
    epoch, path = ckpt_lib.find_checkpoint(model_dir)
    assert path, f"no checkpoint under {model_dir}"
    return path


def merge_final(new_type_dirs: list, base_dir: str, output_dir: str) -> str:
    """Union new agent types' params with the collaboration base (last
    wins on overlap — the base)."""
    paths = [best_ckpt(d) for d in new_type_dirs] + [best_ckpt(base_dir)]
    merged = ckpt_lib.merge_checkpoints(
        paths, drop_prefixes=DROP_FROM_NEW_TYPES
    )
    os.makedirs(output_dir, exist_ok=True)
    out = ckpt_lib.save_checkpoint(output_dir, merged, epoch=0, bestval=True)
    # carry the base's config as a starting point for the final infer cfg
    base_cfg = os.path.join(base_dir, "config.yaml")
    if os.path.exists(base_cfg) and not os.path.exists(
        os.path.join(output_dir, "config.yaml")
    ):
        shutil.copy(base_cfg, os.path.join(output_dir, "config.yaml"))
    print(f"[merge_final] wrote {out}")
    return out


def main(argv=None):
    p = argparse.ArgumentParser("heal_tpu merge tools")
    p.add_argument("command", choices=["merge_final"])
    p.add_argument("dirs", nargs="+",
                   help="new-type dirs..., base dir, output dir")
    args = p.parse_args(argv)
    if args.command == "merge_final":
        *new_dirs, base, out = args.dirs
        merge_final(new_dirs, base, out)


if __name__ == "__main__":
    main()
