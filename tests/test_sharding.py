"""Unit tests for the (data, agent, model) mesh sharding rules.

The integration twin is __graft_entry__.dryrun_multichip, which jits the
full flagship train step over a 2x2x2 mesh — too heavy for CI on this
box, so here we verify the placement rules themselves on tiny arrays.
"""
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
