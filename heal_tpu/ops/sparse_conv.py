"""Sparse 3D convolution primitives (SECOND backbone) — TPU-native.

Replaces spconv (reference sub_modules/sparse_backbone_3d.py + the
external spconv library) with a fixed-capacity, sort-based implicit-GEMM
formulation that maps onto XLA:

  * active voxels live in capacity-``V`` arrays: sorted linear ``keys``
    (z*H*W + y*W + x; padding = INT32_MAX), ``coords`` (V, 3) and
    ``feats`` (V, C);
  * the "rulebook" is implicit: for each of the 27 kernel offsets the
    neighbor's key is formed arithmetically and found with a vectorized
    binary search (jnp.searchsorted) in the sorted key array — no host
    rulebook build, no hash tables;
  * each offset contributes gather -> (V, Cin) @ W_o -> scatter-free
    accumulate, so the FLOPs run as 27 dense MXU GEMMs;
  * strided convolution generates exact spconv-style output sites
    (k=3, s=2, p=1: each input contributes to <= 8 candidate outputs)
    via sort-dedup compaction at fixed capacity.

All shapes static; batched via vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

INVALID = np.int32(2**31 - 1)


def linear_key(coords, grid_zyx):
    """coords (V, 3) [z, y, x] -> sorted-friendly linear key."""
    d, h, w = grid_zyx
    return coords[:, 0] * (h * w) + coords[:, 1] * w + coords[:, 2]


def voxelize_points(points, mask, lidar_range, voxel_size, max_voxels):
    """Points -> mean-feature voxels (MeanVFE + spconv voxelizer parity).

    points: (N, 4); mask: (N,). Returns dict with
    keys (V,) sorted, coords (V, 3) [z, y, x], feats (V, 4) per-voxel mean,
    valid (V,).
    """
    x0, y0, z0, x1, y1, z1 = lidar_range
    vx, vy, vz = voxel_size
    nx = int(round((x1 - x0) / vx))
    ny = int(round((y1 - y0) / vy))
    nz = int(round((z1 - z0) / vz))

    xi = jnp.floor((points[:, 0] - x0) / vx).astype(jnp.int32)
    yi = jnp.floor((points[:, 1] - y0) / vy).astype(jnp.int32)
    zi = jnp.floor((points[:, 2] - z0) / vz).astype(jnp.int32)
    ok = (
        mask
        & (xi >= 0) & (xi < nx)
        & (yi >= 0) & (yi < ny)
        & (zi >= 0) & (zi < nz)
    )
    key = zi * (ny * nx) + yi * nx + xi
    key = jnp.where(ok, key, INVALID)

    order = jnp.argsort(key)
    key_s = key[order]
    pts_s = jnp.take(points, order, axis=0)
    okf = (key_s != INVALID).astype(points.dtype)[:, None]

    # unique compaction: head flags -> ranks -> scatter to capacity V
    head = jnp.concatenate(
        [jnp.ones(1, bool), key_s[1:] != key_s[:-1]]
    ) & (key_s != INVALID)
    rank = jnp.cumsum(head.astype(jnp.int32)) - 1  # id of the voxel
    rank = jnp.where(head | (key_s != INVALID), rank, max_voxels)
    rank = jnp.minimum(rank, max_voxels)

    seg_sum = jax.ops.segment_sum(
        jnp.concatenate([pts_s * okf, okf], axis=-1),
        rank,
        num_segments=max_voxels + 1,
        indices_are_sorted=True,
    )
    feats = seg_sum[:max_voxels, :4] / jnp.maximum(
        seg_sum[:max_voxels, 4:5], 1.0
    )
    keys_out = jnp.full((max_voxels,), INVALID, jnp.int32)
    keys_out = keys_out.at[jnp.where(head, rank, max_voxels)].set(
        jnp.where(head, key_s, INVALID), mode="drop"
    )
    valid = keys_out != INVALID
    kk = jnp.where(valid, keys_out, 0)
    coords = jnp.stack(
        [kk // (ny * nx), (kk // nx) % ny, kk % nx], axis=1
    ).astype(jnp.int32)
    return {
        "keys": keys_out,
        "coords": jnp.where(valid[:, None], coords, 0),
        "feats": feats,
        "valid": valid,
        "grid": (nz, ny, nx),
    }


def _offsets(k: int = 3):
    r = range(-(k // 2), k // 2 + 1)
    return [(dz, dy, dx) for dz in r for dy in r for dx in r]


def gather_neighbor(keys, coords, valid, grid_zyx, offset):
    """Index of the active voxel at coords+offset (or V, the miss slot)."""
    d, h, w = grid_zyx
    dz, dy, dx = offset
    nz = coords[:, 0] + dz
    ny_ = coords[:, 1] + dy
    nx_ = coords[:, 2] + dx
    in_bounds = (
        valid
        & (nz >= 0) & (nz < d)
        & (ny_ >= 0) & (ny_ < h)
        & (nx_ >= 0) & (nx_ < w)
    )
    nk = nz * (h * w) + ny_ * w + nx_
    pos = jnp.searchsorted(keys, nk, method="sort")
    pos = jnp.clip(pos, 0, keys.shape[0] - 1)
    found = in_bounds & (keys[pos] == nk)
    return jnp.where(found, pos, keys.shape[0]), found


def _lookup_batched(keys, queries, ok):
    """Positions of ``queries`` (Q,) in sorted ``keys`` (V,), miss -> V.

    ONE sort-based searchsorted over the whole query batch: the default
    scan-method binary search is log(V) random gathers per query and
    measured 66 of the 73 ms of a sparse-conv layer on v5e; a single
    method='sort' call over all offsets' queries is ~20x cheaper (sorts
    are fast on TPU, gathers are not).
    """
    v = keys.shape[0]
    pos = jnp.searchsorted(keys, queries, method="sort")
    pos = jnp.clip(pos, 0, v - 1)
    found = ok & (keys[pos] == queries)
    return jnp.where(found, pos, v)


def neighbor_table(sp):
    """(V, 27) gather indices for the 3x3x3 stencil (miss slot = V).

    Built ONCE per resolution level and shared by every submanifold conv
    at that level; all 27 offsets resolve in a single batched sort-based
    lookup (see _lookup_batched).
    """
    keys, coords, valid = sp["keys"], sp["coords"], sp["valid"]
    d, h, w = sp["grid"]
    v = keys.shape[0]
    offs = jnp.asarray(_offsets(), jnp.int32)  # (27, 3)
    nz = coords[:, None, 0] + offs[None, :, 0]  # (V, 27)
    ny_ = coords[:, None, 1] + offs[None, :, 1]
    nx_ = coords[:, None, 2] + offs[None, :, 2]
    ok = (
        valid[:, None]
        & (nz >= 0) & (nz < d)
        & (ny_ >= 0) & (ny_ < h)
        & (nx_ >= 0) & (nx_ < w)
    )
    nk = nz * (h * w) + ny_ * w + nx_
    return _lookup_batched(
        keys, nk.reshape(-1), ok.reshape(-1)
    ).reshape(v, 27)


def apply_table_conv(feats, table, weights, valid, bias=None):
    """One wide gather + ONE implicit GEMM for a K-offset conv.

    feats (V, Cin); table (O, K) indices into feats (V = zero row);
    weights (K, Cin, Cout). The (O, K*Cin) @ (K*Cin, Cout) contraction
    replaces K narrow GEMMs — a single MXU-shaped matmul.
    """
    v, cin = feats.shape
    o, k = table.shape
    cout = weights.shape[-1]
    feats_pad = jnp.concatenate(
        [feats, jnp.zeros((1, cin), feats.dtype)], axis=0
    )
    g = jnp.take(feats_pad, table.reshape(-1), axis=0).reshape(
        o, k * cin
    )
    out = jnp.dot(
        g,
        weights.reshape(k * cin, cout).astype(feats.dtype),
        preferred_element_type=feats.dtype,
    )
    if bias is not None:
        out = out + bias
    return out * valid[:, None]


def subm_conv(sp, weights, bias=None, table=None):
    """Submanifold 3x3x3 conv: outputs only at existing active sites.

    sp: dict from voxelize_points (keys sorted). weights: (27, Cin, Cout).
    Pass a precomputed ``table`` (neighbor_table(sp)) to share the
    neighbor search across convs at the same level. Returns (V, Cout).
    """
    if table is None:
        table = neighbor_table(sp)
    return apply_table_conv(
        sp["feats"], table, weights, sp["valid"], bias
    )


def downsample_sites(sp, max_out, stride=(2, 2, 2), padding=(1, 1, 1)):
    """Exact spconv SparseConv3d(k=3, s=2, p=1) output-site generation.

    Each input coord c contributes to output o per axis where
    2o - p <= c <= 2o - p + 2, i.e. up to 2 options per axis -> 8
    candidates. Sort-dedup to capacity ``max_out``.
    """
    coords, valid = sp["coords"], sp["valid"]
    d, h, w = sp["grid"]
    od, oh, ow = (
        (d + 2 * padding[0] - 3) // stride[0] + 1,
        (h + 2 * padding[1] - 3) // stride[1] + 1,
        (w + 2 * padding[2] - 3) // stride[2] + 1,
    )
    cand_keys = []
    for bz in (0, 1):
        for by in (0, 1):
            for bx in (0, 1):
                oz = (coords[:, 0] + padding[0]) // stride[0] - bz
                oy = (coords[:, 1] + padding[1]) // stride[1] - by
                ox = (coords[:, 2] + padding[2]) // stride[2] - bx
                ok = (
                    valid
                    & (oz >= 0) & (oz < od)
                    & (oy >= 0) & (oy < oh)
                    & (ox >= 0) & (ox < ow)
                    # the candidate must actually cover c:
                    # receptive field of o on axis: [2o - p, 2o - p + 2]
                    & (coords[:, 0] >= 2 * oz - padding[0])
                    & (coords[:, 0] <= 2 * oz - padding[0] + 2)
                    & (coords[:, 1] >= 2 * oy - padding[1])
                    & (coords[:, 1] <= 2 * oy - padding[1] + 2)
                    & (coords[:, 2] >= 2 * ox - padding[2])
                    & (coords[:, 2] <= 2 * ox - padding[2] + 2)
                )
                k = oz * (oh * ow) + oy * ow + ox
                cand_keys.append(jnp.where(ok, k, INVALID))
    cand = jnp.concatenate(cand_keys)  # (8V,)
    cand = jnp.sort(cand)
    head = jnp.concatenate([jnp.ones(1, bool), cand[1:] != cand[:-1]]) & (
        cand != INVALID
    )
    rank = jnp.minimum(jnp.cumsum(head.astype(jnp.int32)) - 1, max_out)
    keys_out = jnp.full((max_out,), INVALID, jnp.int32)
    keys_out = keys_out.at[jnp.where(head, rank, max_out)].set(
        jnp.where(head, cand, INVALID), mode="drop"
    )
    valid_out = keys_out != INVALID
    kk = jnp.where(valid_out, keys_out, 0)
    coords_out = jnp.stack(
        [kk // (oh * ow), (kk // ow) % oh, kk % ow], axis=1
    ).astype(jnp.int32)
    return {
        "keys": keys_out,
        "coords": jnp.where(valid_out[:, None], coords_out, 0),
        "valid": valid_out,
        "grid": (od, oh, ow),
    }


def strided_table(sp, out_sites, padding=(1, 1, 1)):
    """(O, 27) gather indices for SparseConv3d k=3 s=2 p=1:
    out[o] reads in[2o - p + d] per stencil offset d. Single batched
    sort-based lookup (see _lookup_batched)."""
    keys = sp["keys"]
    oc = out_sites["coords"]
    ovalid = out_sites["valid"]
    o = oc.shape[0]
    d, h, w = sp["grid"]
    offs = jnp.asarray(_offsets(), jnp.int32)  # (27, 3)
    cz = 2 * oc[:, None, 0] - padding[0] + offs[None, :, 0] + 1
    cy = 2 * oc[:, None, 1] - padding[1] + offs[None, :, 1] + 1
    cx = 2 * oc[:, None, 2] - padding[2] + offs[None, :, 2] + 1
    ok = (
        ovalid[:, None]
        & (cz >= 0) & (cz < d)
        & (cy >= 0) & (cy < h)
        & (cx >= 0) & (cx < w)
    )
    nk = cz * (h * w) + cy * w + cx
    return _lookup_batched(
        keys, nk.reshape(-1), ok.reshape(-1)
    ).reshape(o, 27)


def strided_conv(sp, out_sites, weights, bias=None, padding=(1, 1, 1),
                 table=None):
    """SparseConv3d k=3 s=2 p=1: out[o] = sum_delta W_d * in[2o - p + d]."""
    if table is None:
        table = strided_table(sp, out_sites, padding)
    return apply_table_conv(
        sp["feats"], table, weights, out_sites["valid"], bias
    )


def to_dense_bev(sp, feats):
    """Sparse voxels -> dense (ny, nx, nz*C) NHWC map (HeightCompression,
    ref sub_modules/height_compression.py: fold z into channels)."""
    d, h, w = sp["grid"]
    c = feats.shape[-1]
    valid = sp["valid"]
    coords = sp["coords"]
    flat = coords[:, 0] * (h * w) + coords[:, 1] * w + coords[:, 2]
    flat = jnp.where(valid, flat, d * h * w)
    dense = jax.ops.segment_sum(
        feats * valid[:, None],
        flat,
        num_segments=d * h * w + 1,
        indices_are_sorted=True,  # keys are sorted z-major
    )
    dense = dense[:-1].reshape(d, h, w, c)
    return dense.transpose(1, 2, 0, 3).reshape(h, w, d * c)


# ------------------------------------------------------------------
# Anisotropic generalizations (kernel/stride/padding per axis) — needed
# for the reference VoxelBackBone8x's conv4 (k3 s2 padding (0, 1, 1))
# and conv_out (kernel (3, 1, 1), stride (2, 1, 1), padding 0)
# (sparse_backbone_3d.py:76-93). The uniform-3x3x3 fast paths above stay
# unchanged; these share apply_table_conv (K taps read from the weights).
def _taps(kernel):
    """0-based kernel taps: input = stride*o - padding + tap."""
    kd, kh, kw = kernel
    return [
        (tz, ty, tx)
        for tz in range(kd)
        for ty in range(kh)
        for tx in range(kw)
    ]


def downsample_sites_nd(sp, max_out, kernel, stride, padding):
    """Exact spconv SparseConv3d output-site generation, per-axis
    kernel/stride/padding. Output o is active iff any input voxel c has
    stride*o - padding <= c <= stride*o - padding + kernel - 1 on every
    axis."""
    coords, valid = sp["coords"], sp["valid"]
    grid = sp["grid"]
    out_grid = tuple(
        (grid[i] + 2 * padding[i] - kernel[i]) // stride[i] + 1
        for i in range(3)
    )
    od, oh, ow = out_grid
    # per-axis candidate outputs: o in [ceil((c - k + 1 + p)/s),
    # floor((c + p)/s)] -> at most ceil(k/s) options
    nopts = [-(-kernel[i] // stride[i]) for i in range(3)]
    cand_keys = []
    for bz in range(nopts[0]):
        for by in range(nopts[1]):
            for bx in range(nopts[2]):
                oz = (coords[:, 0] + padding[0]) // stride[0] - bz
                oy = (coords[:, 1] + padding[1]) // stride[1] - by
                ox = (coords[:, 2] + padding[2]) // stride[2] - bx
                lo = (
                    stride[0] * oz - padding[0],
                    stride[1] * oy - padding[1],
                    stride[2] * ox - padding[2],
                )
                ok = (
                    valid
                    & (oz >= 0) & (oz < od)
                    & (oy >= 0) & (oy < oh)
                    & (ox >= 0) & (ox < ow)
                    & (coords[:, 0] >= lo[0])
                    & (coords[:, 0] <= lo[0] + kernel[0] - 1)
                    & (coords[:, 1] >= lo[1])
                    & (coords[:, 1] <= lo[1] + kernel[1] - 1)
                    & (coords[:, 2] >= lo[2])
                    & (coords[:, 2] <= lo[2] + kernel[2] - 1)
                )
                k = oz * (oh * ow) + oy * ow + ox
                cand_keys.append(jnp.where(ok, k, INVALID))
    cand = jnp.sort(jnp.concatenate(cand_keys))
    head = jnp.concatenate([jnp.ones(1, bool), cand[1:] != cand[:-1]]) & (
        cand != INVALID
    )
    rank = jnp.minimum(jnp.cumsum(head.astype(jnp.int32)) - 1, max_out)
    keys_out = jnp.full((max_out,), INVALID, jnp.int32)
    keys_out = keys_out.at[jnp.where(head, rank, max_out)].set(
        jnp.where(head, cand, INVALID), mode="drop"
    )
    valid_out = keys_out != INVALID
    kk = jnp.where(valid_out, keys_out, 0)
    coords_out = jnp.stack(
        [kk // (oh * ow), (kk // ow) % oh, kk % ow], axis=1
    ).astype(jnp.int32)
    return {
        "keys": keys_out,
        "coords": jnp.where(valid_out[:, None], coords_out, 0),
        "valid": valid_out,
        "grid": out_grid,
    }


def strided_table_nd(sp, out_sites, kernel, stride, padding):
    """(O, K) gather indices: out[o] tap t reads in[stride*o - padding + t]."""
    keys = sp["keys"]
    oc = out_sites["coords"]
    ovalid = out_sites["valid"]
    o = oc.shape[0]
    d, h, w = sp["grid"]
    taps = jnp.asarray(_taps(kernel), jnp.int32)  # (K, 3)
    cz = stride[0] * oc[:, None, 0] - padding[0] + taps[None, :, 0]
    cy = stride[1] * oc[:, None, 1] - padding[1] + taps[None, :, 1]
    cx = stride[2] * oc[:, None, 2] - padding[2] + taps[None, :, 2]
    ok = (
        ovalid[:, None]
        & (cz >= 0) & (cz < d)
        & (cy >= 0) & (cy < h)
        & (cx >= 0) & (cx < w)
    )
    nk = cz * (h * w) + cy * w + cx
    k = taps.shape[0]
    return _lookup_batched(
        keys, nk.reshape(-1), ok.reshape(-1)
    ).reshape(o, k)


def strided_conv_nd(sp, out_sites, weights, kernel, stride, padding,
                    bias=None):
    """Anisotropic SparseConv3d; weights (K, Cin, Cout), K = prod(kernel),
    taps ordered z-major (matches spconv's (kd, kh, kw, in, out) layout
    flattened over the spatial axes)."""
    table = strided_table_nd(sp, out_sites, kernel, stride, padding)
    return apply_table_conv(
        sp["feats"], table, weights, out_sites["valid"], bias
    )
