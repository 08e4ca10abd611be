"""Column-form sparse 3D convolution (SECOND backbone) — TPU-native v2.

Same capability as ops/sparse_conv.py (spconv replacement for the
reference sub_modules/sparse_backbone_3d.py), reformulated around what
TPUs are good at. The voxel-level engine pays for per-voxel random
access three ways: 27-offset key searches (sorts), narrow row gathers
(~1 element/cycle), and 8-candidate site dedup sorts. Lidar scenes are
dense in z (a few occupied cells per column) but sparse in (y, x), so
this engine keeps the z axis DENSE and is sparse only over BEV columns:

  * active columns live in capacity-``Vc`` arrays: sorted 2D linear
    ``ckeys`` (y*W + x, padding INT32_MAX), ``coords2`` (Vc, 2),
    ``feats`` (Vc, Z, C) with z dense, and a per-voxel occupancy mask
    ``occ`` (Vc, Z);
  * a 3x3x3 conv needs only NINE neighbor lookups (dy, dx) — ~10x fewer
    key lookups than the voxel engine — and each gather moves one FLAT
    (Z*C,) row: gathering (Vc, Z, C) sub-arrays makes XLA move tiny
    (Z, C) tiles (measured 2x slower in bf16 and 7x in f32 on v5e than
    the same bytes as lane-aligned flat rows);
  * neighbor ranks come from a dense (H*W,) rank MAP (scatter each
    column's rank to its cell, read 9 cells) built once per resolution
    level and shared by every conv at that level — 2.5x faster than the
    sorted-key searchsorted it replaces, with zero sorts;
  * the z part of the stencil is three dense shifts folded into ONE
    (Vc*Z, 3*Cin) @ (3*Cin, Cout) MXU GEMM per (dy, dx) offset;
  * submanifold semantics stay EXACT: inactive voxels hold zeros and
    every conv output is re-masked with ``occ`` (a dense conv restricted
    to active sites equals the sparse conv because absent neighbors
    contribute zero);
  * strided (k=3, s=2, p=1) site generation dedups 4 candidates in 2D
    (vs 8 in 3D) and derives the output occupancy from max-pooled input
    occupancy — identical site sets to spconv's rule.

Weights keep the voxel engine's (27, Cin, Cout) layout in
sparse_conv._offsets() order (dz-major), so parameters are
interchangeable between engines; tests/test_sparse_conv.py checks the
two engines agree on the same weights.

All shapes static; batched via vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .sparse_conv import INVALID, _offsets


def _offsets2d():
    return [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _regroup_weights(weights):
    """(27, Cin, Cout) dz-major -> per-(dy,dx) (3*Cin, Cout) blocks.

    Row order inside each block is dz = -1, 0, +1 to match the
    [z-1, z, z+1] shifted-feature stack.
    """
    cin, cout = weights.shape[1], weights.shape[2]
    idx = {off: i for i, off in enumerate(_offsets())}
    blocks = []
    for dy, dx in _offsets2d():
        rows = [weights[idx[(dz, dy, dx)]] for dz in (-1, 0, 1)]
        blocks.append(jnp.concatenate(rows, axis=0))  # (3*Cin, Cout)
    return blocks


def voxelize_columns(points, mask, lidar_range, voxel_size, max_cols,
                     presorted: bool = False):
    """Points -> mean-feature voxel columns (MeanVFE parity).

    points (N, 4); mask (N,). Returns dict with ckeys (Vc,) sorted 2D
    keys, coords2 (Vc, 2) [y, x], feats (Vc, Z, 4) per-voxel means,
    occ (Vc, Z) bool, cvalid (Vc,), grid (Z, H, W).

    ``presorted``: points already host-ordered by the full voxel key
    (scene.py packs SECOND modalities that way) — skips the device
    argsort; a running max guards the monotone contract against
    host/device rounding disagreement at bin edges (a straggler point
    merges into the previous voxel — bounded local error).
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
    col = yi * nx + xi
    full = jnp.where(ok, col * nz + zi, INVALID)

    if presorted:
        full_s = jax.lax.associative_scan(jnp.maximum, full)
        pts_s = points
    else:
        order = jnp.argsort(full)
        full_s = full[order]
        pts_s = jnp.take(points, order, axis=0)
    okf = (full_s != INVALID).astype(points.dtype)[:, None]
    col_s = jnp.where(full_s != INVALID, full_s // nz, INVALID)
    z_s = jnp.where(full_s != INVALID, full_s % nz, 0)

    chead = jnp.concatenate(
        [jnp.ones(1, bool), col_s[1:] != col_s[:-1]]
    ) & (full_s != INVALID)
    crank = jnp.cumsum(chead.astype(jnp.int32)) - 1
    crank = jnp.where(full_s != INVALID, crank, max_cols)
    crank = jnp.minimum(crank, max_cols)

    slot = jnp.where(crank < max_cols, crank * nz + z_s, max_cols * nz)
    seg = jnp.zeros((max_cols * nz + 1, 5), points.dtype)
    seg = seg.at[slot].add(
        jnp.concatenate([pts_s * okf, okf], axis=-1),
        indices_are_sorted=True,
    )
    cnt = seg[: max_cols * nz, 4:5]
    feats = (seg[: max_cols * nz, :4] / jnp.maximum(cnt, 1.0)).reshape(
        max_cols, nz, 4
    )
    occ = (cnt > 0).reshape(max_cols, nz)

    ckeys = jnp.full((max_cols,), INVALID, jnp.int32)
    ckeys = ckeys.at[jnp.where(chead, crank, max_cols)].set(
        jnp.where(chead, col_s, INVALID), mode="drop"
    )
    cvalid = ckeys != INVALID
    kk = jnp.where(cvalid, ckeys, 0)
    coords2 = jnp.stack([kk // nx, kk % nx], axis=1).astype(jnp.int32)
    return {
        "ckeys": ckeys,
        "coords2": jnp.where(cvalid[:, None], coords2, 0),
        "feats": feats,
        "occ": occ & cvalid[:, None],
        "cvalid": cvalid,
        "grid": (nz, ny, nx),
    }


def rank_map(cols):
    """Dense (H*W + 1,) int32 map: 2D cell key -> column rank; miss = Vc.

    Built once per resolution level and shared by column_table AND
    strided_table at that level (plus the strided table of the NEXT
    level, which queries this level's columns). The trailing dump slot
    absorbs invalid-column writes; lookups must mask out-of-range
    queries themselves (the tables do).
    """
    ckeys, cvalid = cols["ckeys"], cols["cvalid"]
    _, h, w = cols["grid"]
    vc = ckeys.shape[0]
    kk = jnp.where(cvalid, ckeys, h * w)
    dmap = jnp.full((h * w + 1,), vc, jnp.int32)
    return dmap.at[kk].set(
        jnp.arange(vc, dtype=jnp.int32), mode="drop"
    )


def column_table(cols, dmap=None):
    """(Vc, 9) neighbor-column indices for the 3x3 BEV stencil; miss = Vc.

    Nine O(1) reads of the level's dense rank map — the 2D analogue of
    sparse_conv.neighbor_table without any sorted-key search.
    """
    if dmap is None:
        dmap = rank_map(cols)
    coords2, cvalid = cols["coords2"], cols["cvalid"]
    _, h, w = cols["grid"]
    vc = cols["ckeys"].shape[0]
    offs = jnp.asarray(_offsets2d(), jnp.int32)  # (9, 2)
    ny_ = coords2[:, None, 0] + offs[None, :, 0]
    nx_ = coords2[:, None, 1] + offs[None, :, 1]
    okq = (
        cvalid[:, None]
        & (ny_ >= 0) & (ny_ < h)
        & (nx_ >= 0) & (nx_ < w)
    )
    nk = jnp.where(okq, ny_ * w + nx_, 0)
    return jnp.where(okq, jnp.take(dmap, nk), vc)


def _zstack(g):
    """(Vc, Z, C) -> (Vc, Z, 3C): [in[z-1], in[z], in[z+1]] per z."""
    zpad = jnp.zeros((g.shape[0], 1, g.shape[2]), g.dtype)
    gm = jnp.concatenate([zpad, g[:, :-1]], axis=1)
    gp = jnp.concatenate([g[:, 1:], zpad], axis=1)
    return jnp.concatenate([gm, g, gp], axis=-1)


def subm_conv(cols, weights, table=None, bias=None):
    """Submanifold 3x3x3 conv on columns: (Vc, Z, Cin) -> (Vc, Z, Cout).

    weights (27, Cin, Cout) in sparse_conv._offsets() order. Outputs are
    re-masked with ``occ`` so only active voxels carry values.

    The identity tap (dy=dx=0) reads the row directly instead of
    gathering it — TPU row gathers move a full sublane tile per index
    (~8-16x amplification; measured 76 GB/s useful vs 628 GB/s
    streaming), so the skipped gather is ~1/9 of the conv's HBM bill.
    (Rank+-1 slice tricks for the dx=+-1 taps were tried and measured
    SLOWER: the slice+key-mask+zstack chain defeats XLA's gather->GEMM
    fusion.)
    """
    if table is None:
        table = column_table(cols)
    feats = cols["feats"]
    vc, z, cin = feats.shape
    cout = weights.shape[-1]
    wdt = feats.dtype
    blocks = _regroup_weights(weights.astype(wdt))
    offs = _offsets2d()
    # gather FLAT (Z*C,) rows — lane-aligned HBM moves (see module doc)
    flat = feats.reshape(vc, z * cin)
    fpad = jnp.concatenate([flat, jnp.zeros((1, z * cin), wdt)], axis=0)
    out = jnp.zeros((vc, z, cout), wdt)
    for j, (dy, dx) in enumerate(offs):
        if dy == 0 and dx == 0:
            # identity tap: the row itself — never pay a gather for it
            g = flat.reshape(vc, z, cin)
        else:
            g = jnp.take(fpad, table[:, j], axis=0).reshape(vc, z, cin)
        gg = _zstack(g).reshape(vc * z, 3 * cin)
        out = out + jnp.dot(
            gg, blocks[j], preferred_element_type=wdt
        ).reshape(vc, z, cout)
    if bias is not None:
        out = out + bias
    return out * cols["occ"][..., None].astype(wdt)


def downsample_columns(cols, max_out):
    """spconv SparseConv3d(k=3, s=2, p=1) output COLUMN generation.

    2D analogue of sparse_conv.downsample_sites: output column (oy, ox)
    is active iff ANY active input column lies in its 3x3 stride-2
    input window — the adjoint of the candidate-scatter rule, computed
    sort-free as a dense max reduce_window over the input occupancy
    image, then cumsum-compacted in key order (so ckeys come out sorted
    exactly like the scatter-dedup it replaces). Any active input voxel
    implies >= 1 active output voxel in the candidate column (the
    stride-2 k=3 p=1 z-windows cover all z), so the 2D rule yields
    exactly spconv's active column set.
    """
    ckeys, cvalid = cols["ckeys"], cols["cvalid"]
    z, h, w = cols["grid"]
    z2 = (z + 2 - 3) // 2 + 1
    h2 = (h + 2 - 3) // 2 + 1
    w2 = (w + 2 - 3) // 2 + 1
    kk = jnp.where(cvalid, ckeys, h * w)
    occ2d = jnp.zeros((h * w + 1,), jnp.int8).at[kk].set(
        1, mode="drop"
    )[: h * w].reshape(h, w)
    act = jax.lax.reduce_window(
        occ2d, jnp.int8(0), jax.lax.max,
        window_dimensions=(3, 3), window_strides=(2, 2),
        padding=((1, 1), (1, 1)),
    ).reshape(-1)  # (h2*w2,) in key order
    mask = act > 0
    rank = jnp.minimum(jnp.cumsum(mask.astype(jnp.int32)) - 1, max_out)
    cell = jnp.arange(h2 * w2, dtype=jnp.int32)
    ckeys_o = jnp.full((max_out,), INVALID, jnp.int32)
    ckeys_o = ckeys_o.at[jnp.where(mask, rank, max_out)].set(
        jnp.where(mask, cell, INVALID), mode="drop"
    )
    cvalid_o = ckeys_o != INVALID
    kko = jnp.where(cvalid_o, ckeys_o, 0)
    coords2_o = jnp.stack([kko // w2, kko % w2], axis=1).astype(jnp.int32)
    return {
        "ckeys": ckeys_o,
        "coords2": jnp.where(cvalid_o[:, None], coords2_o, 0),
        "cvalid": cvalid_o,
        "grid": (z2, h2, w2),
    }


def strided_table(cols, out_cols, dmap=None):
    """(O, 9) input-column indices for the strided conv: output column o
    reads input column (2*oy + dy, 2*ox + dx) per 2D offset; miss = Vc.

    ``dmap`` is the INPUT level's rank_map (shared with column_table)."""
    if dmap is None:
        dmap = rank_map(cols)
    cvalid = cols["cvalid"]
    _, h, w = cols["grid"]
    oc = out_cols["coords2"]
    ovalid = out_cols["cvalid"]
    vc = cols["ckeys"].shape[0]
    offs = jnp.asarray(_offsets2d(), jnp.int32)
    cy = 2 * oc[:, None, 0] + offs[None, :, 0]
    cx = 2 * oc[:, None, 1] + offs[None, :, 1]
    okq = (
        ovalid[:, None]
        & (cy >= 0) & (cy < h)
        & (cx >= 0) & (cx < w)
    )
    nk = jnp.where(okq, cy * w + cx, 0)
    return jnp.where(okq, jnp.take(dmap, nk), vc)


def _zwindows(g, z2):
    """(O, Z, C) -> (O, Z2, 3C): strided windows in[2*zo - 1 + k], k=0..2."""
    o, z, c = g.shape
    zpad = jnp.zeros((o, 1, c), g.dtype)
    gp = jnp.concatenate([zpad, g, zpad], axis=1)  # (O, Z+2)
    wins = [
        jax.lax.slice_in_dim(gp, k, k + 2 * z2 - 1, stride=2, axis=1)
        for k in range(3)
    ]
    return jnp.concatenate(wins, axis=-1)


def strided_conv(cols, out_cols, weights, table=None, bias=None):
    """SparseConv3d k=3 s=2 p=1 on columns -> (O, Z2, Cout) + out occ.

    Returns ``out_cols`` completed with feats and occ (occ = max-pooled
    input occupancy over each output voxel's 3x3x3 receptive field).
    """
    if table is None:
        table = strided_table(cols, out_cols)
    feats, occ = cols["feats"], cols["occ"]
    vc, z, cin = feats.shape
    z2 = out_cols["grid"][0]
    o = table.shape[0]
    cout = weights.shape[-1]
    wdt = feats.dtype
    blocks = _regroup_weights(weights.astype(wdt))
    # ONE flat gather per offset moves feats AND occupancy: occ rides as
    # an extra Z lanes appended to the (Z*C,) feature row (a separate
    # (Z,)-row occ gather would be latency-bound on 20-byte moves)
    flat = jnp.concatenate(
        [feats.reshape(vc, z * cin), occ.astype(wdt)], axis=1
    )
    fpad = jnp.concatenate(
        [flat, jnp.zeros((1, z * cin + z), wdt)], axis=0
    )
    out = jnp.zeros((o, z2, cout), wdt)
    occ_o = jnp.zeros((o, z2), wdt)
    for j in range(9):
        row = jnp.take(fpad, table[:, j], axis=0)  # (O, Z*Cin + Z)
        g = row[:, : z * cin].reshape(o, z, cin)
        gg = _zwindows(g, z2).reshape(o * z2, 3 * cin)
        out = out + jnp.dot(
            gg, blocks[j], preferred_element_type=wdt
        ).reshape(o, z2, cout)
        go = row[:, z * cin:][..., None]  # (O, Z, 1)
        occ_o = jnp.maximum(
            occ_o, _zwindows(go, z2).max(axis=-1)
        )
    if bias is not None:
        out = out + bias
    occ_b = (occ_o > 0) & out_cols["cvalid"][:, None]
    out = out * occ_b[..., None].astype(wdt)
    return dict(out_cols, feats=out, occ=occ_b)


def to_dense_bev(cols, feats=None):
    """Columns -> dense (H, W, Z*C) NHWC map (HeightCompression parity:
    z folded into channels, z-major like sparse_conv.to_dense_bev)."""
    if feats is None:
        feats = cols["feats"]
    z, h, w = cols["grid"]
    vc, _, c = feats.shape
    ckeys, cvalid = cols["ckeys"], cols["cvalid"]
    # sparse_conv.to_dense_bev lays channels out z-major: (y, x, z*c)
    # with channel index z*C + c; (Vc, Z, C).reshape gives that order.
    rows = (feats * cols["occ"][..., None].astype(feats.dtype)).reshape(
        vc, z * c
    )
    kk = jnp.where(cvalid, ckeys, h * w)
    dense = jnp.zeros((h * w + 1, z * c), feats.dtype)
    dense = dense.at[kk].set(
        rows, mode="drop", indices_are_sorted=True, unique_indices=True
    )
    return dense[:-1].reshape(h, w, z * c)


def to_dense_voxels(cols):
    """Columns -> dense (Z, H, W, C) canvas + (Z, H, W) occupancy.

    Scatter of Vc rows; used by the SECOND stack's dense tail (the last
    level's submanifold convs run densely — its grid is small after 8x
    downsampling and the output is densified right after anyway, so the
    rank/table machinery and row gathers are pure overhead there).
    """
    z, h, w = cols["grid"]
    feats, occ, cvalid = cols["feats"], cols["occ"], cols["cvalid"]
    vc, _, c = feats.shape
    kk = jnp.where(cvalid, cols["ckeys"], h * w)
    dense = jnp.zeros((h * w + 1, z, c), feats.dtype).at[kk].set(
        feats * cvalid[:, None, None].astype(feats.dtype), mode="drop"
    )[: h * w]
    docc = jnp.zeros((h * w + 1, z), bool).at[kk].set(
        occ & cvalid[:, None], mode="drop"
    )[: h * w]
    dense = dense.reshape(h, w, z, c).transpose(2, 0, 1, 3)
    return dense, docc.reshape(h, w, z).transpose(2, 0, 1)


def dense_subm_conv(dense, docc, weights):
    """Dense 3x3x3 conv restricted to active sites == submanifold conv
    (absent neighbors hold zeros; outputs masked to input occupancy).

    dense (Z, H, W, C); weights (27, Cin, Cout) in _offsets order
    ((dz, dy, dx) z-major = the NDHWC kernel's spatial order).
    """
    z, h, w, cin = dense.shape
    cout = weights.shape[-1]
    k = weights.astype(dense.dtype).reshape(3, 3, 3, cin, cout)
    out = jax.lax.conv_general_dilated(
        dense[None], k, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=dense.dtype,
    )[0]
    return out * docc[..., None].astype(out.dtype)
