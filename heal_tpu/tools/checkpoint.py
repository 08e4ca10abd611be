"""Checkpoint save / resume / merge.

Reference semantics (tools/train_utils.py:54-138, tools/heal_tools.py):
  * ``net_epoch{E}.ckpt`` every save_freq, ``net_epoch_bestval_at{E}.ckpt``
    tracking the best validation loss (older best deleted);
  * resume picks bestval if present else max epoch;
  * LOOSE loading — missing/extra keys reported, intersection applied —
    is what makes HEAL's merge-and-partial-load protocol work. Here
    checkpoints are parameter pytrees (flax msgpack), so the loose load is
    a recursive dict union and the stage-3 merge is a pytree union.
"""
from __future__ import annotations

import os
import re

import numpy as np
from flax import serialization


def save_checkpoint(model_dir: str, state: dict, epoch: int, bestval: bool = False):
    """state: {'params': ..., 'batch_stats': ..., 'epoch': int}."""
    os.makedirs(model_dir, exist_ok=True)
    if bestval:
        for old in os.listdir(model_dir):
            if old.startswith("net_epoch_bestval_at"):
                os.remove(os.path.join(model_dir, old))
        name = f"net_epoch_bestval_at{epoch}.ckpt"
    else:
        name = f"net_epoch{epoch}.ckpt"
    path = os.path.join(model_dir, name)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(dict(state, epoch=epoch)))
    return path


def find_checkpoint(model_dir: str):
    """-> (epoch, path) of bestval if present else max epoch; (0, None) if none."""
    best = None
    max_epoch, max_path = 0, None
    for name in os.listdir(model_dir):
        m = re.fullmatch(r"net_epoch_bestval_at(\d+)\.ckpt", name)
        if m:
            best = (int(m.group(1)), os.path.join(model_dir, name))
        m = re.fullmatch(r"net_epoch(\d+)\.ckpt", name)
        if m and int(m.group(1)) > max_epoch:
            max_epoch = int(m.group(1))
            max_path = os.path.join(model_dir, name)
    if best:
        return best
    return max_epoch, max_path


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _merge_into(dst: dict, src: dict, path=""):
    """Recursive union: src wins on leaves; report key diffs."""
    added, replaced = [], []
    for k, v in src.items():
        p = f"{path}/{k}"
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            a, r = _merge_into(dst[k], v, p)
            added += a
            replaced += r
        else:
            (replaced if k in dst else added).append(p)
            dst[k] = v
    return added, replaced


def loose_update(target: dict, source: dict, verbose: bool = True):
    """Copy source leaves into target where paths match (loose load).

    Returns the list of source paths that had no counterpart in target.
    """
    missing = []

    def rec(dst, src, path=""):
        for k, v in src.items():
            p = f"{path}/{k}"
            if k not in dst:
                missing.append(p)
                continue
            if isinstance(v, dict) and isinstance(dst[k], dict):
                rec(dst[k], v, p)
            else:
                if hasattr(dst[k], "shape") and np.shape(dst[k]) != np.shape(v):
                    missing.append(p + " (shape mismatch)")
                    continue
                dst[k] = v

    rec(target, source)
    if verbose and missing:
        print(f"[checkpoint] {len(missing)} source keys not loaded:")
        for p in missing[:10]:
            print("   ", p)
    return missing


def merge_checkpoints(paths: list, drop_prefixes=(), verbose: bool = True) -> dict:
    """HEAL stage-3 merge: union of parameter pytrees, later wins.

    drop_prefixes: top-level param keys to drop from the *non-base* dicts
    (reference drops per-type single heads, heal_tools.py:92-103).
    """
    merged: dict = {}
    for i, path in enumerate(paths):
        ckpt = load_checkpoint(path)
        for section in ("params", "batch_stats"):
            src = ckpt.get(section, {})
            if i < len(paths) - 1:  # base (last) keeps everything
                src = {
                    k: v
                    for k, v in src.items()
                    if not any(k.startswith(d) for d in drop_prefixes)
                }
            merged.setdefault(section, {})
            added, replaced = _merge_into(merged[section], src)
            if verbose:
                print(
                    f"[merge] {os.path.basename(path)} {section}: "
                    f"+{len(added)} ~{len(replaced)}"
                )
    return merged
