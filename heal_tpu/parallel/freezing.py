"""Stage freezing via optimizer masking.

Replaces the reference's requires_grad surgery + fix_bn
(heter_pyramid_single.py:27,74-96, utils/model_utils.py): frozen subtrees
get ``optax.set_to_zero`` updates, so stage-2 training updates only the
new agent type's encoder/backbone/aligner while pyramid/shrink/heads stay
exactly at their stage-1 values.
"""
from __future__ import annotations

import optax


def param_labels(params: dict, fix_modules) -> dict:
    """Label top-level param subtrees 'freeze' / 'train'."""

    def label_tree(tree, frozen: bool):
        if isinstance(tree, dict):
            return {k: label_tree(v, frozen) for k, v in tree.items()}
        return "freeze" if frozen else "train"

    return {
        k: label_tree(v, k in set(fix_modules)) for k, v in params.items()
    }


def freeze_wrap(tx: optax.GradientTransformation, params: dict, fix_modules):
    """Wrap an optimizer so ``fix_modules`` subtrees receive zero updates."""
    if not fix_modules:
        return tx
    labels = param_labels(params, fix_modules)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )


def freeze_stats(new_stats, old_stats, fix_modules):
    """Keep frozen modules' batch_stats at their loaded values.

    The reference fixes BN modules inside fix_modules to eval mode
    (utils/model_utils.py:9-16), so their running statistics never drift
    during stage-2 / compressor training. The models already run frozen
    submodules in eval mode; this guards the state update as well.
    """
    if not fix_modules or not old_stats or not new_stats:
        return new_stats
    out = dict(new_stats)
    for k in fix_modules:
        if k in old_stats:
            out[k] = old_stats[k]
    return out
