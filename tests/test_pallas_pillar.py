"""pillar_tables (Pallas segmented reduce) vs a plain-XLA reference.

Runs the kernel in interpreter mode (CPU CI has no Mosaic); the real-TPU
path is exercised by bench.py and HEAL_TPU_TESTS_ON_TPU runs.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from heal_tpu.ops import pallas_pillar as pp


def run_kernel(fi, u, g4, w1, w2, b_aff, s_total, nx, cells, vx, vy, geom0):
    """Pad to block size, run the kernel, expand onto the dense canvas."""
    n = len(fi)
    f = u.shape[1]
    pb = pp.P_BLOCK
    npad = -n % pb
    if npad:
        fi = np.concatenate([fi, np.full(npad, s_total, np.int32)])
        u = np.pad(u, ((0, npad), (0, 0)))
        g4 = np.pad(g4, ((0, npad), (0, 0)))
    prev = np.concatenate([fi[:1] - 1, fi[:-1]])
    cidx = (np.cumsum(fi != prev) - 1).astype(np.int32)
    nxt = np.concatenate([fi[1:], fi[-1:] + 1])
    ends = (fi != nxt).astype(np.int32)
    geom = np.zeros(f, np.float32)
    geom[:8] = [vx, vy, geom0[0], geom0[1], geom0[2],
                float(nx), float(cells), float(s_total)]
    consts = np.concatenate(
        [w1, w2, b_aff[None], geom[None]], 0).astype(np.float32)
    vals, cells_tab = pp.pillar_tables(
        jnp.asarray(u), jnp.asarray(g4), jnp.asarray(cidx),
        jnp.asarray(ends), jnp.asarray(fi, jnp.float32),
        jnp.asarray(fi // cells, jnp.float32), jnp.asarray(consts),
        interpret=True,
    )
    # gap rows repeat the previous run's cell with a ZERO payload, so the
    # expansion is a sorted scatter-ADD (the encoder's contract)
    ct = np.asarray(cells_tab)[:, 0]
    assert (np.diff(ct) >= 0).all(), "cells column must be monotone"
    canvas = jnp.zeros((s_total, f), jnp.float32).at[ct].add(
        vals.astype(jnp.float32), indices_are_sorted=True, mode="drop")
    return canvas, ct, np.asarray(vals)


def reference(fi, u, g4, w1, w2, b_aff, s_total, nx, cells, vx, vy, geom0):
    """Dense-table XLA formulation (the encoder's non-Pallas path)."""
    seg = jax.ops.segment_sum(jnp.asarray(g4), jnp.asarray(fi),
                              num_segments=s_total)
    cnt = seg[:, 3:4]
    cell_in = jnp.arange(s_total) % cells
    yi = (cell_in // nx).astype(jnp.float32)
    xi = (cell_in % nx).astype(jnp.float32)
    center = jnp.stack([xi * vx + geom0[0], yi * vy + geom0[1],
                        jnp.full_like(xi, geom0[2])], -1)
    tb = -(seg[:, :3] @ w1) / jnp.maximum(cnt, 1.0) + center @ w2 + b_aff
    m = jax.ops.segment_max(jnp.asarray(u), jnp.asarray(fi),
                            num_segments=s_total)
    vals = jnp.where(jnp.isfinite(m), jnp.maximum(m + tb, 0.0), 0.0)
    touched = jax.ops.segment_sum(jnp.ones_like(fi), jnp.asarray(fi),
                                  num_segments=s_total) > 0
    return jnp.where(touched[:, None], vals, 0.0)


@pytest.mark.parametrize("seed,n_pts,f,cells_hw", [
    (0, 2048, 64, (32, 16)),
    (1, 1536 + 512, 64, (8, 8)),   # dense runs: few cells, long runs
    (2, 512, 128, (64, 32)),       # single block
])
def test_pillar_tables_matches_reference(seed, n_pts, f, cells_hw):
    nx, ny = cells_hw
    cells = nx * ny + 1
    b = 2
    s_total = b * cells
    rng = np.random.RandomState(seed)
    ids = np.sort(rng.randint(0, cells, n_pts // b * b).reshape(b, -1), 1)
    fi = (ids + np.arange(b)[:, None] * cells).reshape(-1).astype(np.int32)
    u = rng.randn(len(fi), f).astype(np.float32)
    g4 = np.concatenate(
        [rng.randn(len(fi), 3).astype(np.float32),
         (rng.rand(len(fi), 1) > 0.2).astype(np.float32)], axis=1)
    w1 = rng.randn(3, f).astype(np.float32)
    w2 = rng.randn(3, f).astype(np.float32)
    b_aff = rng.randn(f).astype(np.float32)
    vx, vy = 0.4, 0.4
    geom0 = (0.2, 0.2, -1.0)

    canvas, out_cells, out_vals = run_kernel(
        fi, u, g4, w1, w2, b_aff, s_total, nx, cells, vx, vy, geom0)
    ref = reference(fi, u, g4, w1, w2, b_aff, s_total, nx, cells, vx, vy,
                    geom0)
    np.testing.assert_allclose(
        np.asarray(canvas), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    # scatter-ADD correctness condition: at most ONE row per cell may
    # carry a nonzero payload (gap rows are zero), and nonzero payloads
    # only land on real cells
    nonzero_seen = set()
    real = set(np.unique(fi))
    for c, v in zip(out_cells, out_vals):
        if np.abs(v).max() > 0:
            assert c not in nonzero_seen, c
            nonzero_seen.add(c)
            if 0 <= c < s_total:
                assert c in real, c


def test_canvas_space_drop_bucket_suppression():
    """Encoder convention (models/encoders.py:_pallas_eval): CANVAS-space
    cellf (= table id minus one drop slot per preceding sample), geom
    stride lane = ny*nx, drop-bucket points at within-sample id ny*nx,
    pad sentinel at table id b*cells. Asserts the in-kernel suppression:
    drop-bucket runs emit zero payloads, gap rows keep the previous REAL
    cell, emitted indices are >= 0 and monotone, and the canvas equals
    the XLA reference restricted to real cells.
    """
    f = 64
    nx, ny = 16, 8
    stride = nx * ny
    cells = stride + 1  # table-space stride (with drop bucket)
    b = 2
    rng = np.random.RandomState(3)
    pb = pp.P_BLOCK
    n_real = 2 * pb - 37  # force sentinel padding
    # per-sample sorted ids in [0, cells): real pillars AND drop bucket
    ids = rng.randint(0, cells, n_real // b * b)
    # make sure both samples have drop-bucket points and sample 0's
    # first run is longer than one point (exercises the carry_cell init)
    ids[:3] = 0
    ids[3:6] = stride
    ids = np.sort(ids.reshape(b, -1), 1)
    fi = (ids + np.arange(b)[:, None] * cells).reshape(-1).astype(np.int32)
    n = len(fi)
    u = rng.randn(n, f).astype(np.float32)
    g4 = np.concatenate(
        [rng.randn(n, 3).astype(np.float32),
         np.ones((n, 1), np.float32)], axis=1)
    w1 = rng.randn(3, f).astype(np.float32)
    w2 = rng.randn(3, f).astype(np.float32)
    b_aff = rng.randn(f).astype(np.float32)
    vx, vy = 0.4, 0.4
    geom0 = (0.2, 0.2, -1.0)
    s_total = b * cells

    # --- kernel, encoder convention ---
    npad = -n % pb
    fi_p = np.concatenate([fi, np.full(npad, s_total, np.int32)])
    u_p = np.pad(u, ((0, npad), (0, 0)))
    g4_p = np.pad(g4, ((0, npad), (0, 0)))
    prev = np.concatenate([fi_p[:1] - 1, fi_p[:-1]])
    cidx = (np.cumsum(fi_p != prev) - 1).astype(np.int32)
    nxt = np.concatenate([fi_p[1:], fi_p[-1:] + 1])
    ends = (fi_p != nxt).astype(np.int32)
    samp = fi_p // cells
    cellf = (fi_p - samp).astype(np.float32)  # canvas-space
    geom = np.zeros(f, np.float32)
    geom[:8] = [vx, vy, geom0[0], geom0[1], geom0[2],
                float(nx), float(stride), 0.0]
    consts = np.concatenate(
        [w1, w2, b_aff[None], geom[None]], 0).astype(np.float32)
    vals, cells_tab = pp.pillar_tables(
        jnp.asarray(u_p), jnp.asarray(g4_p), jnp.asarray(cidx),
        jnp.asarray(ends), jnp.asarray(cellf),
        jnp.asarray(samp, jnp.float32), jnp.asarray(consts),
        interpret=True,
    )
    ct = np.asarray(cells_tab)[:, 0]
    out_vals = np.asarray(vals)

    assert (ct >= 0).all(), "no negative emitted indices (would wrap)"
    assert (np.diff(ct) >= 0).all(), "cells column must be monotone"
    # suppressed (drop-bucket) and sentinel cells never carry payload
    # inside the canvas: every nonzero row's cell is a REAL canvas cell
    real_canvas = {
        int(t - t // cells) for t in fi if t % cells != stride
    }
    for c, v in zip(ct, out_vals):
        if np.abs(v).max() > 0 and c < b * stride:
            assert c in real_canvas, c
    # rows before the first finished run: cell 0, zero payload
    first_end = int(np.argmax(ends))
    if first_end > 0:
        assert (ct[:first_end] == 0).all()
        assert np.abs(out_vals[:first_end]).max() == 0

    canvas = jnp.zeros((b * stride, f), jnp.float32).at[ct].add(
        vals.astype(jnp.float32), indices_are_sorted=True, mode="drop")

    # --- reference: table-space dense result, drop bucket sliced off ---
    ref = reference(fi, u, g4, w1, w2, b_aff, s_total, nx, cells, vx, vy,
                    geom0)
    ref = np.asarray(ref).reshape(b, cells, f)[:, :stride].reshape(-1, f)
    np.testing.assert_allclose(np.asarray(canvas), ref, rtol=2e-5,
                               atol=2e-5)


def test_run_spanning_many_blocks():
    # one giant run across 3+ blocks + tail runs: carry correctness
    f = 64
    pb = pp.P_BLOCK
    n = 4 * pb
    rng = np.random.RandomState(0)
    fi = np.concatenate([
        np.full(3 * pb + 17, 5, np.int32),
        np.sort(rng.randint(6, 200, n - 3 * pb - 17)),
    ]).astype(np.int32)
    u = rng.randn(n, f).astype(np.float32)
    g4 = np.concatenate(
        [rng.randn(n, 3).astype(np.float32), np.ones((n, 1), np.float32)], 1)
    cells = 257
    s_total = cells
    zero3 = np.zeros((3, f), np.float32)
    bz = np.zeros(f, np.float32)

    canvas, _, _ = run_kernel(fi, u, g4, zero3, zero3, bz, s_total, 256,
                              cells, 1.0, 1.0, (0.0, 0.0, 0.0))
    # the giant run's value = relu(max over ALL its points)
    expect = np.maximum(u[: 3 * pb + 17].max(0), 0.0)
    np.testing.assert_allclose(np.asarray(canvas[5]), expect, rtol=2e-5,
                               atol=2e-5)
    ref = reference(fi, u, g4, zero3, zero3, bz, s_total, 256, cells,
                    1.0, 1.0, (0.0, 0.0, 0.0))
    np.testing.assert_allclose(np.asarray(canvas), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
