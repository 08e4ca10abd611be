"""Pallas TPU kernel: fused segmented sum+max over presorted pillar runs.

The PointPillars encoder reduces per-point features into per-pillar rows
(max for the PFN features, sum for the cluster-mean/count terms). XLA
lowers each ``jax.ops.segment_*`` to a scatter costing ~2 ms per op at
flagship scale (150k points, 64 ch) on a v5e — the dominant encoder cost
(see BASELINE.md round-2 profile). Points arrive SORTED by pillar id
(the host-presort contract, data/scene.py), so segments are contiguous
runs and the whole reduction is one streaming pass:

  * sequential TPU grid over blocks of P points; a VMEM carry holds the
    partial (sum, max) of the run in progress at each block boundary;
  * in-block segmented inclusive scan (log2 P shifted select steps on
    the VPU);
  * run-end rows are gathered to block-local positions with a one-hot
    (P, P) matmul on the MXU — no scatter;
  * the per-pillar epilogue (cluster-mean term, pillar-center term,
    BatchNorm affine, ReLU) runs on the placed rows, so the kernel emits
    FINAL pillar values together with their BEV cell ids.

Each block emits exactly P output rows — its finished runs, with gap
rows forward-filled as exact duplicates of the previous run — so outputs
stream through the standard block pipeline (no dynamic stores). One XLA
scatter remains downstream: expanding the (cell, value) rows onto the
dense BEV canvas with ``mode="drop"`` (models/encoders.py:_pallas_eval).

Cells are CANVAS-space (per-sample stride ny*nx, no drop bucket): runs
whose within-sample cell id lands in the drop bucket (>= ny*nx — points
outside the lidar range or padding) are suppressed in-kernel (treated as
"no finished run", so they forward-fill the previous real run's row).
The canvas expand therefore scatters straight into the final
(B*ny*nx, F) buffer and reshapes for free — no post-scatter slice copy
of the 80+ MB canvas to strip a drop bucket.

Replaces the two segment ops + table math of the XLA fused path
(models/encoders.py:_fused); the reference counterpart is the CUDA
spconv voxelizer + PillarVFE max-pool (sub_modules/pillar_vfe.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 256 measured ~7% faster than 512 end-to-end at 150k points on v5e (the
# grid is sequential; smaller blocks shorten the per-block one-hot matmul
# + scan dependency chains more than they add block-count overhead)
P_BLOCK = 256
NEG = -1e30  # max-identity; -inf breaks (inf - inf) in downstream algebra


def _shift_down(x, d, fill):
    """rows i <- x[i - d] (first d rows = fill); static slices only."""
    pad = jnp.full((d,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[:-d]], axis=0)


def _kernel(
    u_ref,  # (P, F) per-point max channels (PFN GEMM, BN-scale folded)
    g_ref,  # (P, 4) f32: per-point sum channels (w*local_xyz, w)
    cidx_ref,  # (P, 1) int32 compact run index (globally sorted)
    ends_ref,  # (P, 1) int32: 1 where the point's run ends
    cellf_ref,  # (P, 1) f32: flat CANVAS cell id (int-valued, < 2^24);
    #              drop-bucket points carry samp*stride + stride
    sampf_ref,  # (P, 1) f32: sample index (per-sample cell offset)
    consts_ref,  # (8, F) f32: rows 0-2 W1=w_mu*s_aff, 3-5 W2=w_raw3*s_aff,
    #              row 6 b_aff, row 7 lanes 0-7 = [vx, vy, x0+vx/2,
    #              y0+vy/2, z_center, nx, stride (= ny*nx, drop bucket
    #              detection threshold), unused]
    vals_ref,  # (P, F) out: final pillar values
    cells_ref,  # (P, 8) int32 out: cell id per row (sentinel = OOB)
    carry_u,  # VMEM (1, F) f32
    carry_g,  # VMEM (1, 4) f32
    carry_cell,  # VMEM (1, 8) f32: cell of the last finished run
    carry_vals,  # VMEM (1, F) f32: its final value row
):
    pid = pl.program_id(0)
    p, f = u_ref.shape

    @pl.when(pid == 0)
    def _():
        carry_u[:] = jnp.full((1, f), NEG, jnp.float32)
        carry_g[:] = jnp.zeros((1, 4), jnp.float32)
        # before any run finishes, gap rows point one cell below the
        # global minimum cell (an untouched canvas row; dropped if < 0)
        carry_cell[:] = jnp.full((1, 8), cellf_ref[0, 0] - 1.0, jnp.float32)
        carry_vals[:] = jnp.zeros((1, f), jnp.float32)

    rel = cidx_ref[:] - cidx_ref[0:1, :]  # (P, 1) int32, 0..P-1
    ends = ends_ref[:]  # (P, 1) int32
    u = u_ref[:].astype(jnp.float32)
    g = g_ref[:]

    # segmented inclusive scan (doubling): after step d, row i holds the
    # reduction over its run's points in (i - 2d, i]
    d = 1
    while d < p:
        same = rel == _shift_down(rel, d, jnp.int32(-1))
        u = jnp.maximum(u, jnp.where(same, _shift_down(u, d, NEG), NEG))
        g = g + jnp.where(same, _shift_down(g, d, 0.0), 0.0)
        d *= 2

    # fold the carried partial run into run 0 — AFTER the scan: the
    # prefix rows each absorb the carry exactly once (pre-scan folding
    # would double-count the sum carry through the doubling steps)
    is0 = rel == 0
    u = jnp.where(is0, jnp.maximum(u, carry_u[:]), u)
    g = g + jnp.where(is0, carry_g[:], 0.0)

    # carry out the (possibly) unfinished last run
    last_end = ends[p - 1, 0]
    carry_u[:] = jnp.where(
        last_end == 1, jnp.full((1, f), NEG, jnp.float32), u[p - 1 : p]
    )
    carry_g[:] = jnp.where(
        last_end == 1, jnp.zeros((1, 4), jnp.float32), g[p - 1 : p]
    )

    # place run-end rows at their block-local row (= rel) via a one-hot
    # matmul on the MXU: placed[r] = sum_i [rel_i == r and end_i] * row_i
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
    onehot = (
        (iota_r == rel.reshape(1, p)) & (ends.reshape(1, p) == 1)
    ).astype(jnp.float32)
    ones = jnp.ones((p, 1), jnp.float32)
    # split by required precision: the max columns are bf16-valued (a max
    # of bf16 inputs) so they tolerate the MXU's default bf16 operand
    # truncation; the CELL ID columns (> 2^8) and the f32 run sums must
    # place exactly — a full-width HIGHEST dot would cost 6 f32 MXU
    # passes over all F lanes, so the exact columns ride a narrow dot
    # bf16 inputs: the scanned maxima stay exactly bf16-representable, so
    # placement (one nonzero per output row) is exact in a bf16 MXU pass
    # and 4x cheaper than f32; f32 inputs keep the f32 pass
    place_dt = (
        jnp.bfloat16 if u_ref.dtype == jnp.bfloat16 else jnp.float32
    )
    placed = jnp.dot(
        onehot.astype(place_dt),
        u.astype(place_dt),
        preferred_element_type=jnp.float32,
    )
    meta = jnp.concatenate(
        [cellf_ref[:], sampf_ref[:], ones, g, jnp.zeros((p, 1), jnp.float32)],
        axis=1,
    )  # (P, 8)
    placed_meta = jnp.dot(
        onehot,
        meta,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    pu = placed[:, :f]
    pcell = placed_meta[:, 0:1]
    psamp = placed_meta[:, 1:2]
    has = placed_meta[:, 2:3] > 0.5
    pg3 = placed_meta[:, 3:6]
    cnt = placed_meta[:, 6:7]

    w1 = consts_ref[0:3, :]
    w2 = consts_ref[3:6, :]
    b_aff = consts_ref[6:7, :]
    geom = consts_ref[7:8, 0:8]  # (1, 8)

    # pillar centers from the cell id (all-f32 int-valued math; ids are
    # exact in f32 below 2^24)
    cin = pcell - psamp * geom[0, 6]  # cell id within sample
    # drop-bucket runs (cell id at/past the per-sample stride: points
    # outside the lidar range, or the sentinel padding) never finish —
    # the fill below duplicates the previous REAL run instead, keeping
    # the emitted cells monotone without a drop bucket in the canvas
    has = has & (cin < geom[0, 6])
    yi = jnp.floor(cin / geom[0, 5])
    xi = cin - yi * geom[0, 5]
    center = jnp.concatenate(
        [
            xi * geom[0, 0] + geom[0, 2],
            yi * geom[0, 1] + geom[0, 3],
            jnp.full_like(xi, geom[0, 4]),
        ],
        axis=1,
    )  # (P, 3)

    tb = (
        -jnp.dot(pg3, w1, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
        / jnp.maximum(cnt, 1.0)
        + jnp.dot(center, w2, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        + b_aff
    )
    final_vals = jnp.where(has, jnp.maximum(pu + tb, 0.0), 0.0)

    # rows with no finished run replicate the PREVIOUS real row's
    # (cell, VALUE) pair — a joint forward fill. Every output row then
    # carries a consistent (cell, value): duplicates are bit-identical,
    # so the canvas expansion can be a pure scatter-SET (write-only, no
    # read-modify-add) with any tie order, and the cells column stays
    # globally monotone (sorted-scatter fast path). Rows before the
    # first finished run anywhere take the carry from the previous block
    # (or the sub-minimum init cell with zero values in block 0).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (p, 8), 0).astype(
        jnp.float32
    )
    # meta8 lanes: [0]=tag (row index of last finished run, -1 = none),
    # [1]=cell; values ride a parallel (P, F) array selected by the same
    # key (lane-aligned shapes keep Mosaic's layout passes happy)
    col8 = jax.lax.broadcasted_iota(jnp.int32, (p, 8), 1)
    tag8 = jnp.where(has, row_ids, -1.0)
    meta8 = jnp.where(col8 == 0, tag8, jnp.where(col8 == 1, pcell, 0.0))
    payf = final_vals
    d = 1
    while d < p:
        s8 = _shift_down(meta8, d, -1.0)
        sf = _shift_down(payf, d, 0.0)
        take = s8[:, 0:1] > meta8[:, 0:1]
        meta8 = jnp.where(take, s8, meta8)
        payf = jnp.where(take, sf, payf)
        d *= 2
    none_yet = meta8[:, 0:1] < 0.0
    cellcol = jnp.where(none_yet, carry_cell[:, 0:1], meta8[:, 1:2])
    payf = jnp.where(none_yet, carry_vals[:], payf)
    carry_cell[:] = jnp.broadcast_to(cellcol[p - 1 : p], (1, 8))
    carry_vals[:] = payf[p - 1 : p]

    vals_ref[:] = payf.astype(vals_ref.dtype)
    cells_ref[:] = jnp.broadcast_to(cellcol + 0.5, (p, 8)).astype(
        jnp.int32
    )


@partial(jax.jit, static_argnames=("interpret",))
def pillar_tables(
    u,  # (N, F) bf16/f32 per-point max channels
    g4,  # (N, 4) f32 per-point sum channels
    cidx,  # (N,) int32 sorted compact run index
    ends,  # (N,) int32 run-end flags
    cellf,  # (N,) f32 flat cell ids (int-valued)
    sampf,  # (N,) f32 sample index per point
    consts,  # (8, F) f32 packed epilogue constants (see _kernel)
    interpret: bool = False,
):
    """-> (vals (N, F), cells (N, 8) int32). See module docstring.

    N must be a multiple of P_BLOCK (callers pad with sentinel-cell
    points). Output row k*P+r holds the r-th run finishing in block k;
    rows without a finished run carry the OOB sentinel cell.
    """
    n, f = u.shape
    assert n % P_BLOCK == 0, n
    nb = n // P_BLOCK

    return pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((P_BLOCK, f), lambda i: (i, 0)),
            pl.BlockSpec((P_BLOCK, 4), lambda i: (i, 0)),
            pl.BlockSpec((P_BLOCK, 1), lambda i: (i, 0)),
            pl.BlockSpec((P_BLOCK, 1), lambda i: (i, 0)),
            pl.BlockSpec((P_BLOCK, 1), lambda i: (i, 0)),
            pl.BlockSpec((P_BLOCK, 1), lambda i: (i, 0)),
            pl.BlockSpec((8, f), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((P_BLOCK, f), lambda i: (i, 0)),
            pl.BlockSpec((P_BLOCK, 8), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, f), u.dtype),
            jax.ShapeDtypeStruct((n, 8), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, f), jnp.float32),
            pltpu.VMEM((1, 4), jnp.float32),
            pltpu.VMEM((1, 8), jnp.float32),
            pltpu.VMEM((1, f), jnp.float32),
        ],
        interpret=interpret,
    )(
        u, g4,
        cidx.reshape(n, 1), ends.reshape(n, 1),
        cellf.reshape(n, 1), sampf.reshape(n, 1),
        consts,
    )
