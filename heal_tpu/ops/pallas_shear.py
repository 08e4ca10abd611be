"""Pallas TPU kernel: per-row fractional horizontal shift.

The building block of the 3-shear BEV warp (ops/warp.affine_warp_shear).
XLA lowers vmapped per-row dynamic slices poorly (measured 32 ms for the
5-agent pyramid warp on v5e); this kernel streams row blocks through VMEM
and does the shifted read as a dynamic-start slice + constant blend —
bandwidth-bound, no gathers.

Interface matches ops.warp._shift_rows: out[i, j] = in[i, j + shifts[i]]
with zero padding, shifts float (fractional, pre-clamped by the caller).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 8


def _kernel(starts_ref, fracs_ref, in_ref, out_ref):
    """in_ref: (ROW_BLOCK, Wp, C) padded rows; out_ref: (ROW_BLOCK, W, C).

    Dynamic sublane starts must be 8-aligned on TPU (and 16-aligned tiles
    for bf16): load from the aligned floor and resolve the 0..7 remainder
    with a static-slice switch.
    """
    pid = pl.program_id(0)
    w = out_ref.shape[1]
    for r in range(ROW_BLOCK):
        row_idx = pid * ROW_BLOCK + r
        s = starts_ref[row_idx]
        s0 = (s // 8) * 8
        rem = s - s0
        seg = in_ref[r, pl.ds(pl.multiple_of(s0, 8), w + 16), :]
        f = fracs_ref[row_idx]  # float32 scalar (bf16 scalar arith is
        # not legal in Mosaic); blend in f32, cast on store

        def mk(k):
            def branch():
                a = seg[k : k + w].astype(jnp.float32)
                b = seg[k + 1 : k + w + 1].astype(jnp.float32)
                return (a * (1.0 - f) + b * f).astype(out_ref.dtype)

            return branch

        out_ref[r] = jax.lax.switch(rem, [mk(k) for k in range(8)])


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def shift_rows_pallas(
    x: jnp.ndarray, shifts: jnp.ndarray, max_shift: int | None = None
) -> jnp.ndarray:
    """x: (H, W, C); shifts: (H,) float. -> (H, W, C).

    ``max_shift`` bounds |shifts| (static) — smaller bounds mean smaller
    padded rows and less DMA traffic. Differentiable in ``x`` (the
    transpose of a fractional shift by s is the shift by -s).
    """
    return _shift_rows_impl(x, shifts, max_shift)


def _shift_rows_fwd(x, shifts, max_shift):
    return _shift_rows_impl(x, shifts, max_shift), shifts


def _shift_rows_bwd(max_shift, shifts, g):
    return _shift_rows_impl(g, -shifts, max_shift), None


shift_rows_pallas.defvjp(_shift_rows_fwd, _shift_rows_bwd)


@partial(jax.jit, static_argnames=("max_shift",))
def _shift_rows_impl(
    x: jnp.ndarray, shifts: jnp.ndarray, max_shift: int | None = None
) -> jnp.ndarray:
    h, w, c = x.shape
    pad = int(max_shift) + 2 if max_shift is not None else w + 2
    pad = -(-pad // 8) * 8 + 16  # aligned + slack for the 8-aligned load
    hp = -h % ROW_BLOCK
    xp_ = jnp.pad(x, ((0, hp), (pad, pad), (0, 0)))
    shifts = jnp.pad(shifts, (0, hp))
    base = jnp.clip(jnp.floor(shifts), -(pad - 16), pad - 16)
    fracs = (shifts - base).astype(jnp.float32)
    starts = (base + pad).astype(jnp.int32)

    hb = h + hp
    wp = w + 2 * pad
    # channel chunks keep vector lanes <= 128 (Mosaic limit)
    cc = c if c <= 128 else 128
    if c % cc != 0:
        cpad = -c % cc
        xp_ = jnp.pad(xp_, ((0, 0), (0, 0), (0, cpad)))
    else:
        cpad = 0
    ct = (c + cpad) // cc

    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(hb // ROW_BLOCK, ct),
            in_specs=[
                pl.BlockSpec(
                    (ROW_BLOCK, wp, cc),
                    lambda i, j, *_: (i, 0, j),
                ),
            ],
            out_specs=pl.BlockSpec(
                (ROW_BLOCK, w, cc),
                lambda i, j, *_: (i, 0, j),
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((hb, w, c + cpad), x.dtype),
    )(starts, fracs, xp_)
    return out[:h, :, :c]
