"""Explicit model/loss registries.

Replaces the reference's importlib + class-name matching
(tools/train_utils.py:141-210) with decorated registries keyed by the
config's ``core_method`` string (same key names as the reference's module
names, so configs carry over).
"""
from __future__ import annotations

MODEL_REGISTRY: dict = {}
LOSS_REGISTRY: dict = {}


def register_model(name: str):
    def deco(cls):
        MODEL_REGISTRY[name] = cls
        return cls

    return deco


def register_loss(name: str):
    def deco(cls):
        LOSS_REGISTRY[name] = cls
        return cls

    return deco


def build_model(model_cfg: dict):
    """Instantiate a flax module from the config's ``model`` section."""
    name = model_cfg["core_method"]
    if name not in MODEL_REGISTRY:
        # lazy import of model files on first use
        from . import center_point  # noqa: F401
        from . import ciassd  # noqa: F401
        from . import fpvrcnn  # noqa: F401
        from . import heter_baseline  # noqa: F401
        from . import heter_pyramid  # noqa: F401
        from . import lift_splat_shoot  # noqa: F401
        from . import pixor  # noqa: F401
        from . import point_pillar  # noqa: F401
        from . import second_model  # noqa: F401
        from . import voxel_net  # noqa: F401

    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model core_method {name!r}; registered: "
            f"{sorted(MODEL_REGISTRY)}"
        )
    args = model_cfg["args"]
    if "bn_momentum" in args:
        # Per-model BN momentum rides the norm-kind string ("batch@0.99")
        # so two models built in one process (e.g. KD teacher + student)
        # each keep their own value — no module-level global.
        mom = float(args["bn_momentum"])
        base = str(args.get("norm", "batch")).split("@")[0]
        if base == "batch":
            args = dict(args, norm=f"batch@{mom}")
    return MODEL_REGISTRY[name](args=args)


def build_loss(loss_cfg: dict):
    name = loss_cfg["core_method"]
    if name not in LOSS_REGISTRY:
        from .. import losses  # noqa: F401
    if name not in LOSS_REGISTRY:
        raise KeyError(
            f"unknown loss core_method {name!r}; registered: "
            f"{sorted(LOSS_REGISTRY)}"
        )
    return LOSS_REGISTRY[name](loss_cfg["args"])
