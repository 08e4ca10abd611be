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
    the VPU) — run-END rows then hold their run's full reductions;
  * the per-pillar epilogue (cluster-mean term, pillar-center term,
    BatchNorm affine, ReLU) runs in place on every row; a narrow forward
    fill (log2 P scan over the 8-lane cell column) replicates each
    finished run's CELL over the following non-end rows, whose value
    payload stays zero.

Each block emits exactly P output rows — run-END rows carry their run's
final value, gap rows the previous run's cell with a zero payload — so
outputs stream through the standard block pipeline (no dynamic stores)
and the cells column stays globally monotone. One XLA scatter remains
downstream: a sorted scatter-ADD expanding the (cell, value) rows onto
the dense BEV canvas with ``mode="drop"``
(models/encoders.py:_pallas_eval); zero gap payloads add nothing.

Cells are CANVAS-space (per-sample stride ny*nx, no drop bucket): runs
whose within-sample cell id lands in the drop bucket (>= ny*nx — points
outside the lidar range or padding) are suppressed in-kernel (treated as
"no finished run", so gap rows keep pointing at the previous real run's
cell). The canvas expand therefore scatters straight into the final
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

import os

# With the (P, P) one-hot placement matmuls gone (see _kernel), per-block
# work is ~linear in P. A/B at 150k points on v5e (kernel stage,
# ms/frame): 256 -> 2.44, 512 -> 2.38, 1024 -> 2.44, 2048 -> VMEM OOM.
P_BLOCK = int(os.environ.get("HEAL_TPU_P_BLOCK", "512"))
if P_BLOCK < 8 or P_BLOCK % 8 != 0:
    raise ValueError(
        f"HEAL_TPU_P_BLOCK={P_BLOCK}: must be a positive multiple of 8 "
        "(TPU sublane tiling); callers pad point counts to this block size"
    )
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
):
    pid = pl.program_id(0)
    p, f = u_ref.shape

    @pl.when(pid == 0)
    def _():
        carry_u[:] = jnp.full((1, f), NEG, jnp.float32)
        carry_g[:] = jnp.zeros((1, 4), jnp.float32)
        # before any run finishes, gap rows point at cell -1: the +0.5
        # int cast below truncates toward zero, so the emitted index is 0.
        # Harmless under the downstream scatter-ADD (the payload of such
        # rows is exactly zero), and it keeps the emitted index column
        # genuinely monotone. (A negative emitted index would NOT be
        # dropped by mode="drop" — XLA normalizes negative indices first,
        # wrapping -1 to the canvas' last row and breaking monotonicity.)
        carry_cell[:] = jnp.full((1, 8), -1.0, jnp.float32)

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

    # run-END rows already hold their run's full reductions (inclusive
    # scan + carry fold), so the epilogue runs IN PLACE on every row and
    # the forward fill below propagates finished (cell, value) pairs over
    # the non-end rows. (An earlier revision compacted run-end rows to
    # block-local positions with (P, P) one-hot MXU matmuls first — the
    # placement is unnecessary given the fill, and the quadratic matmuls
    # were ~40% of kernel time at P=256.)
    pu = u
    pcell = cellf_ref[:]
    psamp = sampf_ref[:]
    has = ends == 1
    pg3 = g[:, 0:3]
    cnt = g[:, 3:4]

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

    # rows with no finished run replicate the PREVIOUS real row's CELL
    # with a ZERO payload (final_vals is already zero there) — the canvas
    # expansion is then a sorted scatter-ADD: gap rows contribute nothing
    # to the real cell they point at, and the cells column stays globally
    # monotone (sorted-scatter fast path). Only the narrow (P, 8) cell
    # column needs a forward fill; the (P, F) value fill of an earlier
    # revision (which enabled a scatter-SET) cost a second full-width
    # log2 P scan for no semantic gain.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (p, 8), 0).astype(
        jnp.float32
    )
    # meta8 lanes: [0]=tag (row index of last finished run, -1 = none),
    # [1]=cell (lane-aligned shapes keep Mosaic's layout passes happy)
    col8 = jax.lax.broadcasted_iota(jnp.int32, (p, 8), 1)
    tag8 = jnp.where(has, row_ids, -1.0)
    meta8 = jnp.where(col8 == 0, tag8, jnp.where(col8 == 1, pcell, 0.0))
    d = 1
    while d < p:
        s8 = _shift_down(meta8, d, -1.0)
        take = s8[:, 0:1] > meta8[:, 0:1]
        meta8 = jnp.where(take, s8, meta8)
        d *= 2
    none_yet = meta8[:, 0:1] < 0.0
    cellcol = jnp.where(none_yet, carry_cell[:, 0:1], meta8[:, 1:2])
    carry_cell[:] = jnp.broadcast_to(cellcol[p - 1 : p], (1, 8))

    vals_ref[:] = final_vals.astype(vals_ref.dtype)
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
    points). Output row i holds (cell, final value) if a run ends at
    point i, else (cell of the latest finished run, zeros) — expand with
    a sorted scatter-ADD; rows before any finished run carry cell 0 with
    a zero payload (adds nothing under scatter-ADD, keeps the index
    column monotone).
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
        ],
        interpret=interpret,
    )(
        u, g4,
        cidx.reshape(n, 1), ends.reshape(n, 1),
        cellf.reshape(n, 1), sampf.reshape(n, 1),
        consts,
    )
