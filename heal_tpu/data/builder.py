"""Dataset builder: (fusion assembler) x (scene backend) composition.

Replaces the reference's ``build_dataset`` eval-based class factory
(data_utils/datasets/__init__.py:15-33) with an explicit pairing. A
"backend" yields scenes (agents + poses + sensors + world objects); the
assembler turns scenes into fixed-shape samples for a fusion timing.
"""
from __future__ import annotations

import numpy as np

from .scene import IntermediateAssembler, collate
from .synthetic import SyntheticDataset


def _build_backend(params: dict, train: bool):
    name = params["fusion"].get("dataset", "synthetic")
    if name == "synthetic":
        args = params["fusion"].get("args") or {}
        args = args if isinstance(args, dict) else {}
        # eval_on_train: evaluate on the training scenes (overfit-AP
        # smoke protocol; the synthetic test split uses disjoint seeds)
        as_train = train or args.get("eval_on_train", False)
        return SyntheticDataset(
            params,
            train=as_train,
            num_scenes=args.get(
                "num_scenes_train" if train else "num_scenes_test",
                32 if train else 8,
            ),
            num_agents=args.get("num_agents", 3),
            num_vehicles=args.get("num_vehicles", 10),
        )
    if name in ("opv2v", "v2xset"):
        from .opv2v import OPV2VBackend

        return OPV2VBackend(params, train=train)
    if name == "dairv2x":
        from .dairv2x import DAIRV2XBackend

        return DAIRV2XBackend(params, train=train)
    if name == "v2xsim":
        from .v2xsim import V2XSimBackend

        return V2XSimBackend(params, train=train)
    raise KeyError(f"unknown dataset backend {name!r}")


class FusionDataset:
    """Iterable over assembled samples + batch iterator."""

    def __init__(self, params: dict, train: bool = True):
        self.params = params
        self.train = train
        self.backend = _build_backend(params, train)
        # a presorted=True encoder on unsorted points silently corrupts
        # its sorted scatter (indices_are_sorted) — refuse the mismatch
        margs = (params.get("model") or {}).get("args") or {}
        wants_sorted = margs.get("presorted", False) or any(
            isinstance(margs.get(m), dict)
            and margs[m].get("presorted", False)
            for m in ("m1", "m2", "m3", "m4")
        )
        if wants_sorted and not params["preprocess"]["args"].get(
            "presort", True
        ):
            raise ValueError(
                "model.args presorted=true requires "
                "preprocess.args.presort=true (host point ordering)"
            )
        method = params["fusion"]["core_method"]
        if method == "intermediate2stage":
            # two-stage models (FPV-RCNN) train their first stage on
            # per-agent labels: single supervision is part of the dataset
            # contract, not an option
            # (ref intermediate_2stage_fusion_dataset.py:33 'stage1' labels)
            params = dict(params)
            model = dict(params.get("model", {}))
            model["args"] = dict(model.get("args", {}), supervise_single=True)
            params["model"] = model
            self.assembler = IntermediateAssembler(params, train)
        elif method in (
            "intermediate",
            "intermediateheter",
            "intermediateheterinfer",
        ):
            self.assembler = IntermediateAssembler(params, train)
        elif method in ("late", "lateheter"):
            from .late_early import LateAssembler

            self.assembler = LateAssembler(params, train)
        elif method == "early":
            from .late_early import EarlyAssembler

            self.assembler = EarlyAssembler(params, train)
        else:
            raise KeyError(f"unknown fusion core_method {method!r}")
        self.modalities = self.assembler.modalities

        # CoAlign: stage-1 detections pre-computed by
        # tools/pose_graph_pre_calc feed box-align pose refinement
        # (ref intermediate_heter_fusion_dataset.py:372-399 reads the
        # stage1 json dump)
        self._precalc = None
        ba = params.get("box_align")
        if ba and ba.get("precalc_path"):
            import json
            import os

            if os.path.exists(ba["precalc_path"]):
                with open(ba["precalc_path"]) as f:
                    self._precalc = json.load(f)
            else:
                import warnings

                warnings.warn(
                    f"box_align.precalc_path {ba['precalc_path']!r} does "
                    "not exist — pose refinement is DISABLED for this run"
                )

    def __len__(self):
        return len(self.backend)

    def __getitem__(self, idx: int) -> dict:
        scene = self.backend.scene(idx)
        if self._precalc is not None:
            entry = self._precalc.get(str(idx))
            if entry:
                # entries are scene-ordered and unfiltered (the
                # pose_graph_pre_calc contract), so zip is positional-safe
                from ..utils.box_align import uncertainty_to_weights

                for agent, e in zip(scene["agents"], entry):
                    agent["pred_centers"] = np.asarray(e["centers"])
                    if "uncertainty" in e:
                        agent["pred_uncertainty"] = uncertainty_to_weights(
                            e["uncertainty"]
                        )
        return self.assembler.assemble(scene)

    @property
    def anchors(self):
        return self.assembler.anchors

    def batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        process_split: bool = True,
    ):
        """Yield collated fixed-shape numpy batches (drops the remainder so
        every batch compiles to the same executable).

        process_split: under multi-host jax, every host shuffles the same
        epoch order (same seed) and takes its own disjoint, equal-length
        slice — the DistributedSampler of the reference's DDP trainer
        (train_ddp.py:45-60). No-op single-host.
        """
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        if process_split:
            from .prefetch import process_shard

            lo, hi = process_shard(len(order))
            order = order[lo:hi]
        for start in range(0, len(order) - batch_size + 1, batch_size):
            idxs = order[start : start + batch_size]
            samples = [self[i] for i in idxs]
            yield collate(samples, tuple(self.modalities))


def build_dataset(params: dict, visualize: bool = False, train: bool = True):
    return FusionDataset(params, train=train)
