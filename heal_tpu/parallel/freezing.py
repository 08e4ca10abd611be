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
