"""PointNet++-style point ops, TPU-native (static shapes, no CUDA).

Replaces the reference's pointnet2_stack/pointnet2_batch CUDA extensions
(pcdet_utils/pointnet2/*, ~2.6k LoC of kernels) used by FPV-RCNN's
VoxelSetAbstraction and RoI head:

  * farthest_point_sample — iterative FPS via lax.fori_loop (O(K*N)
    vector math; no data-dependent shapes);
  * ball_query — brute-force masked distances computed in keypoint
    chunks (the (K, N) matrix never materializes whole), returning a
    fixed ``nsample`` neighbor set per query with a validity mask;
  * group_and_pool — gather neighbor features, center on the query, run
    a caller-supplied per-point MLP, masked max-pool.

All functions treat padded points via a ``mask`` argument; padded entries
can never be sampled or grouped.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = 1e9


@partial(jax.jit, static_argnames=("num_samples",))
def farthest_point_sample(points, mask, num_samples: int):
    """points (N, 3), mask (N,) -> (num_samples,) int32 indices.

    Iterative farthest-point sampling; padded points get -inf distance so
    they are never chosen (if fewer than num_samples valid points exist,
    indices repeat — harmless for downstream masked pooling).
    """
    n = points.shape[0]
    d2 = jnp.where(mask, BIG, -BIG)  # padded points never win

    def body(i, state):
        dist, idx = state
        last = idx[i - 1]
        delta = points - points[last]
        nd = (delta * delta).sum(-1)
        dist = jnp.minimum(dist, jnp.where(mask, nd, -BIG))
        idx = idx.at[i].set(jnp.argmax(dist))
        return dist, idx

    first = jnp.argmax(mask)  # first valid point
    idx0 = jnp.zeros(num_samples, jnp.int32).at[0].set(first)
    _, idx = jax.lax.fori_loop(1, num_samples, body, (d2, idx0))
    return idx


def ball_query(
    queries,
    points,
    mask,
    radius: float,
    nsample: int,
    chunk: int = 256,
):
    """queries (K, 3), points (N, 3), mask (N,) ->
    (neighbors (K, nsample) int32, valid (K, nsample) bool).

    The nearest ``nsample`` points within ``radius`` of each query
    (reference ball_query takes the first found; nearest is a superset
    capability). Computed in K-chunks to bound the distance matrix.
    """
    k = queries.shape[0]
    pad = (-k) % chunk
    q = jnp.pad(queries, ((0, pad), (0, 0)))
    r2 = radius * radius

    def per_chunk(qc):
        d2 = (
            (qc[:, None, :] - points[None, :, :]) ** 2
        ).sum(-1)  # (chunk, N)
        d2 = jnp.where(mask[None, :], d2, BIG)
        neg, idx = jax.lax.top_k(-d2, nsample)
        return idx.astype(jnp.int32), (-neg) <= r2

    qc = q.reshape(-1, chunk, 3)
    idx, valid = jax.lax.map(per_chunk, qc)
    idx = idx.reshape(-1, nsample)[:k]
    valid = valid.reshape(-1, nsample)[:k]
    return idx, valid


def group_and_pool(queries, points, feats, idx, valid, mlp, train=False):
    """Gather neighbors, center xyz on the query, apply ``mlp`` to
    [rel_xyz, feats], masked max-pool over the neighbor axis.

    queries (K, 3); points (N, 3); feats (N, C) or None; idx/valid
    (K, nsample). mlp: callable (K, nsample, C_in) -> (K, nsample, C_out).
    Returns (K, C_out).
    """
    nbr_xyz = points[idx]  # (K, S, 3)
    rel = nbr_xyz - queries[:, None, :]
    parts = [rel]
    if feats is not None:
        parts.append(feats[idx])
    grouped = jnp.concatenate(parts, axis=-1)
    out = mlp(grouped)
    out = jnp.where(valid[..., None], out, -BIG)
    pooled = out.max(axis=1)
    # queries with zero neighbors -> zeros
    any_valid = valid.any(axis=1, keepdims=True)
    return jnp.where(any_valid, pooled, 0.0)
