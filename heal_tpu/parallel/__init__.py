"""Parallelism & training runtime.

Replaces the reference's DDP/NCCL layer (tools/train_ddp.py,
multi_gpu_utils.py) with jax.sharding: a device Mesh with a ``data`` axis,
batch sharded over it, parameters replicated, gradient all-reduce inserted
by XLA. bf16 compute replaces AMP. Stage freezing is optimizer masking
(freezing.py), schedulers mirror the reference's step/multistep/exponential
(schedulers.py).
"""
from .trainer import TrainState, Trainer, make_mesh

__all__ = ["TrainState", "Trainer", "make_mesh"]
