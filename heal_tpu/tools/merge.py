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


def rename_modules(ckpt_path: str, mapping: dict) -> str:
    """Rename top-level module subtrees in a checkpoint pytree.

    Counterpart of the reference's checkpoint-surgery renamer
    (tools/heal_tools.py:113-130 ``rename_to_new_version``: key-prefix
    rewrites to load old-version checkpoints into renamed module trees).
    The original file is kept as ``<path>.oldversion``.

        python -m heal_tpu.tools.merge rename ckpt.ckpt old=new [...]
    """
    ckpt = ckpt_lib.load_checkpoint(ckpt_path)

    def rename_tree(tree):
        if not isinstance(tree, dict):
            return tree
        return {mapping.get(k, k): v for k, v in tree.items()}

    out = {
        col: rename_tree(sub) if isinstance(sub, dict) else sub
        for col, sub in ckpt.items()
    }
    shutil.copy(ckpt_path, ckpt_path + ".oldversion")
    from flax import serialization

    with open(ckpt_path, "wb") as f:
        f.write(serialization.msgpack_serialize(out))
    print(f"[rename] {ckpt_path}: {mapping} (backup .oldversion)")
    return ckpt_path


def main(argv=None):
    p = argparse.ArgumentParser("heal_tpu merge tools")
    p.add_argument("command", choices=["merge_final", "rename"])
    p.add_argument("dirs", nargs="+",
                   help="merge_final: new-type dirs..., base dir, output "
                        "dir; rename: ckpt_path old=new [old=new ...]")
    args = p.parse_args(argv)
    if args.command == "merge_final":
        *new_dirs, base, out = args.dirs
        merge_final(new_dirs, base, out)
    elif args.command == "rename":
        path, *pairs = args.dirs
        mapping = dict(pair.split("=", 1) for pair in pairs)
        rename_modules(path, mapping)


if __name__ == "__main__":
    main()
