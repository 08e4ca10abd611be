"""Unit tests for the (data, agent, model) mesh sharding rules.

The integration twin is __graft_entry__.dryrun_multichip, which jits the
full flagship train step over a 2x2x2 mesh — too heavy for CI on this
box, so here we verify the placement rules themselves on tiny arrays.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heal_tpu.parallel import sharding as shlib
from jax.sharding import PartitionSpec as P


@pytest.fixture(scope="module")
def mesh222():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return shlib.make_mesh(8, agent=2, model=2)


def test_factor_mesh():
    assert shlib.factor_mesh(8) == (2, 2, 2)
    assert shlib.factor_mesh(4) == (1, 2, 2)
    assert shlib.factor_mesh(2) == (1, 1, 2)
    assert shlib.factor_mesh(1) == (1, 1, 1)
    assert shlib.factor_mesh(3) == (3, 1, 1)
    for n in (1, 2, 3, 4, 6, 8, 16):
        d, a, m = shlib.factor_mesh(n)
        assert d * a * m == n


def test_batch_pspecs(mesh222):
    batch = {
        "inputs_m1": {
            "points": np.zeros((2, 4, 8, 4), np.float32),
            "point_mask": np.zeros((2, 4, 8), bool),
        },
        "slots_m1": np.zeros((2, 4), np.int32),
        "agent_mask": np.zeros((2, 4), bool),
        "pairwise_affine": np.zeros((2, 4, 4, 2, 3), np.float32),
        "targets": np.zeros((2, 16, 16, 14), np.float32),
        "targets_single": np.zeros((2, 4, 16, 16, 14), np.float32),
        "meta": "static",
    }
    sharded = shlib.shard_batch(batch, mesh222)
    spec = lambda x: x.sharding.spec
    assert spec(sharded["inputs_m1"]["points"]) == P("data", "agent")
    assert spec(sharded["slots_m1"]) == P("data", "agent")
    assert spec(sharded["agent_mask"]) == P("data", "agent")
    assert spec(sharded["targets_single"]) == P("data", "agent")
    # batch-only leaves stay data-sharded
    assert spec(sharded["pairwise_affine"]) == P("data")
    assert spec(sharded["targets"]) == P("data")
    assert sharded["meta"] == "static"


def test_batch_pspec_drops_nondivisible(mesh222):
    # L=3 doesn't divide the 2-way agent axis -> falls back to data-only
    batch = {"slots_m1": np.zeros((2, 3), np.int32)}
    sharded = shlib.shard_batch(batch, mesh222)
    assert sharded["slots_m1"].sharding.spec == P("data", None)


def test_param_pspecs(mesh222):
    state = {
        "conv_kernel": np.zeros((3, 3, 8, 16), np.float32),
        "dense_kernel": np.zeros((8, 16), np.float32),
        "bn_scale": np.zeros((16,), np.float32),
        "odd_kernel": np.zeros((3, 3, 8, 7), np.float32),  # 7 % 2 != 0
        "step": jnp.zeros((), jnp.int32),
    }
    sharded = shlib.shard_state(state, mesh222)
    assert sharded["conv_kernel"].sharding.spec == P(
        None, None, None, "model"
    )
    assert sharded["dense_kernel"].sharding.spec == P(None, "model")
    # vectors/scalars/non-divisible kernels replicate
    assert sharded["bn_scale"].sharding.spec in (P(), P(None))
    assert sharded["odd_kernel"].sharding.spec in (
        P(), P(None, None, None, None)
    )
    assert sharded["step"].sharding.spec == P()


def test_data_only_mesh_accepts_same_specs():
    # a 1-axis mesh (plain --devices N) must accept the same batches
    mesh = shlib.make_mesh(len(jax.devices()), agent=1, model=1)
    batch = {"slots_m1": np.zeros((len(jax.devices()), 4), np.int32)}
    sharded = shlib.shard_batch(batch, mesh)
    assert sharded["slots_m1"].sharding.spec[0] == "data"


def test_sharded_matmul_matches_single_device(mesh222):
    # end-to-end: a tensor-parallel dense layer computes the same result
    x = np.random.RandomState(0).randn(4, 8).astype(np.float32)
    w = np.random.RandomState(1).randn(8, 16).astype(np.float32)
    ref = x @ w
    state = shlib.shard_state({"w": w}, mesh222)
    xb = shlib.shard_batch({"targets": x}, mesh222)
    out = jax.jit(lambda a, b: a @ b)(xb["targets"], state["w"])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5)


def _flagship_setup(norm=None):
    """Tiny flagship (HEAL pyramid collab m1) trainer + one batch,
    agent capacity 4 so the 2-way agent axis divides it."""
    import os

    import jax

    from heal_tpu.config import load_yaml
    from heal_tpu.data import build_dataset
    from heal_tpu.losses import build_loss
    from heal_tpu.models import build_model
    from heal_tpu.parallel import Trainer
    from heal_tpu.parallel.schedulers import build_optimizer
    from heal_tpu.parallel.trainer import to_device

    cfg = load_yaml(
        os.path.join(os.path.dirname(__file__), "configs", "entry_tiny.yaml")
    )
    cfg["train_params"]["max_cav"] = 4
    cfg["fusion"]["args"]["num_agents"] = 4
    cfg["fusion"]["args"]["num_scenes_train"] = 4
    if norm is not None:
        cfg["model"]["args"]["norm"] = norm
    ds = build_dataset(cfg, train=True)
    model = build_model(cfg["model"])
    criterion = build_loss(cfg["loss"])
    tx = build_optimizer(cfg["optimizer"], cfg.get("lr_scheduler"), 4)
    trainer = Trainer(
        model=model, criterion=criterion, tx=tx,
        supervise_single=cfg["model"]["args"].get("supervise_single", False),
    )
    batch = to_device(next(ds.batches(2, shuffle=False)))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    return trainer, state, batch


def _equivalence_deltas(trainer, state, batch, mesh):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from __graft_entry__ import sharded_equivalence_deltas

    sb = shlib.shard_batch(batch, mesh)
    ss = shlib.shard_state(state, mesh)
    return sharded_equivalence_deltas(trainer, state, batch, ss, sb)


class TestShardedEquivalence:
    """One full flagship train step on the 2x2x2 virtual mesh computes
    the SAME loss and gradients as single-device — the multi-chip
    correctness story on a box with no multi-chip hardware."""

    def test_grads_match_tight_without_bn(self, mesh222):
        """norm='none' isolates the sharding math itself: gradients
        agree to f32 reassociation noise (~1e-7 relative)."""
        trainer, state, batch = _flagship_setup(norm="none")
        d_loss, d_grads = _equivalence_deltas(trainer, state, batch, mesh222)
        loss_scale = 400.0  # entry_tiny initial loss magnitude
        assert d_loss <= 1e-5 * loss_scale, d_loss
        assert d_grads <= 1e-5 * loss_scale, d_grads

    def test_grads_match_with_batchnorm(self, mesh222):
        """With BatchNorm the function itself is ill-conditioned at
        init: rsqrt(var + 1e-5) on near-dead channels amplifies ANY fp
        noise (the same deltas appear CPU-vs-CPU with a different
        reduction order). Loss stays at reassociation level; gradients
        are bounded by the conditioning-scaled tolerance."""
        trainer, state, batch = _flagship_setup()
        d_loss, d_grads = _equivalence_deltas(trainer, state, batch, mesh222)
        assert d_loss <= 1e-5 * 400.0, d_loss
        assert d_grads <= 1e-3 * 400.0, d_grads
