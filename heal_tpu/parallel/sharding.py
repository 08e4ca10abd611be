"""Multi-axis device-mesh sharding for collaborative-perception models.

The reference scales with exactly one axis: DDP data parallelism over
NCCL (opencood/tools/train_ddp.py, multi_gpu_utils.py). On a TPU mesh
this workload exposes three natural axes, and GSPMD lets us express all
of them as sharding annotations — XLA inserts the collectives:

  data  — batch samples. Params replicated; the gradient psum over this
          axis is DDP's all-reduce.
  agent — the packed per-sample agent axis (L). Each agent's
          encoder->backbone->aligner branch is independent until BEV
          fusion, so the FLOPs-dominant encoder stage shards cleanly;
          XLA all-gathers BEV features at the slot-scatter/fusion
          boundary. This is the physical analogue of the simulated V2X
          channel: each chip "is" a vehicle, the all-gather is the
          communication round.
  model — conv output channels (tensor parallel): conv/dense kernels are
          sharded on their out-channel dim, activations follow by
          propagation, and XLA all-gathers/reduce-scatters between
          layers as profitable.

Pipeline and expert parallelism do not apply to this model family (no
pipelinable stage depth at these sizes, no MoE experts); the honest
multi-chip story is dp x agent x tp, which this module provides.

Everything here is annotation-only: `shard_batch`/`shard_state` place
arrays with NamedShardings and jit picks the shardings up from the
committed operands, so the same trainer code runs single-chip when the
mesh is trivial.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "agent", "model")


def make_mesh(
    n_devices: int | None = None,
    data: int | None = None,
    agent: int = 1,
    model: int = 1,
) -> Mesh:
    """Mesh over the first ``n_devices`` with axes (data, agent, model).

    ``data`` defaults to whatever is left after agent/model. Axis order
    puts ``model`` innermost so tensor-parallel collectives ride the
    fastest ICI links (scaling-book convention: most-frequent collective
    on the innermost mesh axis).
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if data is None:
        assert n % (agent * model) == 0, (n, agent, model)
        data = n // (agent * model)
    assert data * agent * model == n, (data, agent, model, n)
    return Mesh(
        np.array(devices[:n]).reshape(data, agent, model), AXES
    )


def factor_mesh(n: int) -> tuple[int, int, int]:
    """Split n devices into (data, agent, model) — prefer giving each
    axis a share so a dryrun genuinely exercises every parallelism."""
    model = 2 if n % 2 == 0 and n > 1 else 1
    agent = 2 if (n // model) % 2 == 0 and n // model > 1 else 1
    return n // (agent * model), agent, model


# keys whose dim-1 is the (padded) agent axis
_AGENT_DIM1 = ("points", "point_mask", "agent_modality")


def batch_pspec(key_path: tuple, leaf) -> P:
    """PartitionSpec for one batch leaf: batch dim -> data; the packed
    agent dim (inputs_mX/*, slots_mX, *_single labels, raw point packs)
    -> agent."""
    if not hasattr(leaf, "ndim") or leaf.ndim == 0:
        return P()
    keys = [getattr(p, "key", "") for p in key_path]
    agent_dim1 = any(
        k.startswith(("inputs_", "slots_")) or k.endswith("_single")
        or k in _AGENT_DIM1 or k == "agent_mask"
        for k in keys
    )
    if agent_dim1 and leaf.ndim >= 2:
        return P("data", "agent")
    return P("data")


def param_pspec(leaf, model_size: int) -> P:
    """Tensor-parallel spec for one param/optimizer leaf: shard the
    out-channel (last) dim of conv/dense kernels over ``model``;
    replicate vectors/scalars (BN, bias) — they are tiny."""
    if not hasattr(leaf, "ndim"):
        return P()
    if leaf.ndim >= 2 and leaf.shape[-1] % model_size == 0 and (
        leaf.shape[-1] >= 2 * model_size
    ):
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()


def _fit(spec: P, shape: tuple, mesh: Mesh) -> P:
    """Drop axis names the mesh doesn't have (so a plain 1-axis 'data'
    mesh accepts the same specs) and axes that don't divide evenly."""
    out = []
    for dim, a in zip(shape, spec):
        ok = a in mesh.shape and dim % mesh.shape[a] == 0
        out.append(a if ok else None)
    return P(*out)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch on the mesh with data(+agent) sharding."""
    def place(path, x):
        if not hasattr(x, "shape"):
            return x
        spec = _fit(batch_pspec(path, x), x.shape, mesh)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, batch)


def shard_state(state, mesh: Mesh):
    """Place TrainState leaves: tensor-parallel over ``model`` where the
    kernel shape allows, replicated otherwise (optimizer moments mirror
    the params' shapes so the same per-leaf rule covers them)."""
    model_size = mesh.shape.get("model", 1)

    def place(x):
        if not hasattr(x, "shape"):
            return x
        spec = _fit(param_pspec(x, model_size), x.shape, mesh)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, state)
