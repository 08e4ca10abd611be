"""BEV affine warp (bilinear grid-sample), NHWC, fixed shapes.

TPU-native equivalent of the reference's core spatial-transform primitive
``warp_affine_simple`` (sub_modules/torch_transformation_utils.py:323-332 —
F.affine_grid + F.grid_sample with zero padding): for every output pixel at
normalized coords (xn, yn) ∈ [-1, 1], sample the source at
``M @ [xn, yn, 1]``. Matches torch's align_corners=False/True conventions
bit-for-bit so the normalized affines from
utils.transform_np.normalize_pairwise_tfm drop in unchanged.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _normalized_grid(h: int, w: int, align_corners: bool, dtype):
    if align_corners:
        xs = jnp.linspace(-1.0, 1.0, w, dtype=dtype)
        ys = jnp.linspace(-1.0, 1.0, h, dtype=dtype)
    else:
        xs = (2.0 * jnp.arange(w, dtype=dtype) + 1.0) / w - 1.0
        ys = (2.0 * jnp.arange(h, dtype=dtype) + 1.0) / h - 1.0
    return jnp.meshgrid(xs, ys)  # (H, W) each


def _to_pixel(coord, size: int, align_corners: bool):
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def affine_warp(src: jnp.ndarray, M: jnp.ndarray, align_corners: bool = False):
    """Warp one image. src: (H, W, C); M: (2, 3) output->input normalized.

    Zero padding outside the source. Returns (H, W, C).
    """
    h, w, _ = src.shape
    dtype = src.dtype
    xn, yn = _normalized_grid(h, w, align_corners, jnp.float32)
    x_in = M[0, 0] * xn + M[0, 1] * yn + M[0, 2]
    y_in = M[1, 0] * xn + M[1, 1] * yn + M[1, 2]
    xp = _to_pixel(x_in, w, align_corners)
    yp = _to_pixel(y_in, h, align_corners)

    x0 = jnp.floor(xp)
    y0 = jnp.floor(yp)
    wx = (xp - x0).astype(dtype)[..., None]
    wy = (yp - y0).astype(dtype)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        vals = src[yi_c, xi_c]  # (H, W, C)
        return vals * inside[..., None].astype(dtype)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _shift_rows_matmul(x: jnp.ndarray, shifts: jnp.ndarray) -> jnp.ndarray:
    """Fractional per-row horizontal shift as a banded matmul.

    out[i, j] = in[i, j + s_i] (linear interp, zero pad) is, per row, a
    1-D resample — i.e. a (W_out, W_in) matrix with two nonzeros per row
    applied to the row. Building that band on the fly from iotas and
    contracting with einsum turns the whole shear pass into MXU work:
    H (W x W) @ (W x C) matmuls instead of per-row dynamic slices. On a
    v5e this beats the Pallas dynamic-slice kernel ~8x at BEV sizes
    (the kernel is dispatch-bound at one grid row per core step).
    """
    h, w, c = x.shape
    j = jnp.arange(w, dtype=jnp.float32)
    # sample position in input coords per (row, output col)
    pos = j[None, :] + shifts[:, None].astype(jnp.float32)  # (H, W)
    band = 1.0 - jnp.abs(pos[:, :, None] - j[None, None, :])  # (H, Wo, Wi)
    band = jnp.maximum(band, 0.0).astype(x.dtype)
    return jnp.einsum("hoi,hic->hoc", band, x)


def _shift_rows(
    x: jnp.ndarray, shifts: jnp.ndarray, max_shift: int | None = None
) -> jnp.ndarray:
    """Fractional per-row horizontal shift with zero padding.

    x: (H, W, C); shifts: (H,) float — out[i, j] = in[i, j + shifts[i]].
    On TPU this is the banded-matmul form (MXU-friendly; see
    _shift_rows_matmul); set HEAL_TPU_SHEAR_BACKEND=pallas for the
    dynamic-slice Pallas kernel (ops/pallas_shear.py — dispatch-bound at
    one grid row per step, kept for comparison). Elsewhere a vmapped
    dynamic-slice fallback with identical semantics.
    """
    if jax.default_backend() == "tpu":
        import os

        if os.environ.get("HEAL_TPU_SHEAR_BACKEND") == "pallas":
            from .pallas_shear import shift_rows_pallas

            return shift_rows_pallas(x, shifts, max_shift=max_shift)
        return _shift_rows_matmul(x, shifts)

    h, w, c = x.shape
    pad = (max_shift + 2) if max_shift is not None else (w + 2)
    xp_ = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    base = jnp.clip(jnp.floor(shifts), -pad, pad)
    frac = (shifts - base).astype(x.dtype)[:, None, None]
    start = (base + pad).astype(jnp.int32)

    def row(r, s, f):
        a = jax.lax.dynamic_slice(r, (s, 0), (w + 1, c))
        return a[:w] * (1 - f) + a[1:] * f

    return jax.vmap(row)(xp_, start, frac)


def _shift_cols(
    x: jnp.ndarray, shifts: jnp.ndarray, max_shift: int | None = None
) -> jnp.ndarray:
    """Fractional per-column vertical shift (transpose + row shift)."""
    out = _shift_rows(x.transpose(1, 0, 2), shifts, max_shift)
    return out.transpose(1, 0, 2)




def affine_warp_shear(src: jnp.ndarray, M: jnp.ndarray) -> jnp.ndarray:
    """Rigid-affine warp via 3-shear (Paeth) decomposition — gather-free.

    Valid for the normalized pairwise BEV affines of this codebase, whose
    PIXEL-space linear part is a pure rotation (normalize_pairwise_tfm
    bakes the aspect ratio so this holds for square BEV cells). Pipeline:
      1. embed the content in a square canvas of side 2r+pad (r = content
         circumradius) — all 3-shear intermediates stay inside;
      2. reduce the rotation with an exact 90-deg content rotation
         (lax.switch over jnp.rot90) so the residual |theta| <= 45 deg;
      3. shear_x(a) . shear_y(b) . shear_x(a) with a = -tan(theta/2),
         b = sin(theta) — per-row/column fractional shifts implemented as
         contiguous dynamic slices (no 2-D gathers, the TPU-fast form);
      4. constant x/y shifts for the translation (R(-theta) t), then
         center crop back to (H, W).
    Equals the bilinear warp up to separable-interpolation order.
    """
    h, w, c = src.shape
    # square working canvas: side >= 2 * circumradius
    r = int(np.ceil(np.sqrt(h * h + w * w) / 2.0))
    side = 2 * r + 4
    cy, cx = (side - h) // 2, (side - w) // 2

    # pixel-space rotation angle + translation (undo aspect factors)
    theta = jnp.arctan2(M[1, 0] * h / w, M[0, 0])
    tx = M[0, 2] * w / 2.0
    ty = M[1, 2] * h / 2.0

    # 90-deg reduction: theta = theta_r + k * pi/2, |theta_r| <= pi/4
    k = jnp.round(theta / (jnp.pi / 2)).astype(jnp.int32)
    theta_r = theta - k.astype(jnp.float32) * (jnp.pi / 2)
    km = jnp.mod(k, 4)
    # decomposed 90-deg rotation applied on the SMALL source: the embed
    # is center-symmetric, so flip/rot of the canvas equals embedding the
    # flipped/rotated source — a (h, w, c) reverse/transpose instead of a
    # (side, side, c) one (~5x fewer bytes; reverses showed up as ~2.5
    # ms/frame of pure relayout in the serve trace). Under vmap a
    # lax.switch would run all four rot90 branches, so: one elementwise
    # flip180 select + one real rot90 select.
    flip180 = (km == 2) | (km == 3)
    do90 = (km == 1) | (km == 3)
    src0 = jnp.where(flip180, src[::-1, ::-1, :], src)
    src_t = jnp.rot90(src0, k=1, axes=(0, 1))  # (w, h, c)
    canvas0 = jax.lax.dynamic_update_slice(
        jnp.zeros((side, side, c), src.dtype), src0, (cy, cx, 0)
    )
    cy_t, cx_t = (side - w) // 2, (side - h) // 2
    canvas_t = jax.lax.dynamic_update_slice(
        jnp.zeros((side, side, c), src.dtype), src_t, (cy_t, cx_t, 0)
    )
    canvas = jnp.where(do90, canvas_t, canvas0)
    # t' = R(-k pi/2) t
    ck = jnp.cos(-k.astype(jnp.float32) * jnp.pi / 2)
    sk = jnp.sin(-k.astype(jnp.float32) * jnp.pi / 2)
    tx_p = ck * tx - sk * ty
    ty_p = sk * tx + ck * ty

    a = -jnp.tan(theta_r / 2.0)
    b = jnp.sin(theta_r)
    coords = jnp.arange(side, dtype=jnp.float32) - (side - 1) / 2.0
    # |theta_r| <= pi/4 -> |a| <= tan(pi/8), |b| <= sin(pi/4), +1 frac
    ms = int(np.ceil(0.7072 * side / 2)) + 2

    # translation g = R(-theta_r) t': integer part moves into the final
    # crop offset (free); fractional parts ride along in passes 2 and 3
    cr, sr = jnp.cos(-theta_r), jnp.sin(-theta_r)
    gx = cr * tx_p - sr * ty_p
    gy = sr * tx_p + cr * ty_p
    gx_i = jnp.floor(gx)
    gy_i = jnp.floor(gy)
    gx_f = gx - gx_i
    gy_f = gy - gy_i

    x1 = _shift_rows(canvas, jnp.clip(a * coords, -ms, ms), ms)
    x2 = _shift_cols(x1, jnp.clip(b * coords + gy_f, -ms, ms), ms)
    x3 = _shift_rows(x2, jnp.clip(a * coords + gx_f, -ms, ms), ms)

    want_y = cy + gy_i.astype(jnp.int32)
    want_x = cx + gx_i.astype(jnp.int32)
    off_y = jnp.clip(want_y, 0, side - h)
    off_x = jnp.clip(want_x, 0, side - w)
    out = jax.lax.dynamic_slice(x3, (off_y, off_x, 0), (h, w, c))
    # translations beyond the canvas margin: finish with constant integer
    # shifts (zero-filled) for the clipped remainder on the small output
    rem_y = (want_y - off_y).astype(jnp.float32)
    rem_x = (want_x - off_x).astype(jnp.float32)
    # constant shifts, but kept in the banded-matmul form: a pad +
    # traced-start dynamic_slice variant measured ~0.6 ms/frame SLOWER at
    # flagship scale (the slice breaks XLA's fusion and materializes the
    # padded canvas; the band einsum stays on the MXU)
    out = _shift_rows(
        out, jnp.clip(rem_x, -w, w) * jnp.ones((h,), jnp.float32), w
    )
    out = _shift_cols(
        out, jnp.clip(rem_y, -h, h) * jnp.ones((w,), jnp.float32), h
    )
    return out


def warp_pairwise(
    features: jnp.ndarray, affine: jnp.ndarray, method: str = "auto"
):
    """All-pairs warp: sender j's map into every receiver i's frame.

    features: (B, L, H, W, C); affine: (B, I, J, 2, 3) where
    affine[b, i, j] maps receiver i's pixel coords into sender j's frame
    (the normalized pairwise matrix layout). Returns (B, I, J, H, W, C).

    Replaces a python loop over receivers (V2VNet-style message passing)
    with nested vmaps — one traced warp instead of L unrolled ones. The
    diagonal (i == j) is an identity warp, which the banded-matmul shear
    reproduces exactly (the band degenerates to the identity matrix).
    """
    if method == "auto":
        method = "shear" if jax.default_backend() == "tpu" else "exact"
    per = affine_warp_shear if method == "shear" else affine_warp
    over_j = jax.vmap(per)  # senders: feats (J, H, W, C), m (J, 2, 3)
    over_ij = jax.vmap(lambda m_i, feats: over_j(feats, m_i),
                       in_axes=(0, None))
    return jax.vmap(over_ij)(affine, features)


def warp_agents_to_ego(
    features: jnp.ndarray,
    affine: jnp.ndarray,
    align_corners: bool = False,
    method: str = "auto",
    skip_ego: bool = True,
):
    """Warp every agent's BEV map into the ego (slot-0) frame.

    features: (B, L, H, W, C); affine: (B, L, L, 2, 3) normalized pairwise
    matrices (affine[b, 0, j] maps ego pixel coords into agent j's frame,
    exactly the matrix the reference passes as ``t_matrix[0, j]``).
    Returns (B, L, H, W, C).

    method: "exact" = direct bilinear gather (torch grid_sample parity,
    but XLA-TPU gathers compile in minutes and run slowly); "shear" =
    3-shear decomposition on the Pallas row-shift kernel (rigid affines,
    ~equal values up to separable-interpolation order, ~10x faster
    compiles); "auto" = shear on TPU, exact elsewhere.

    skip_ego: the ego->ego affine is the identity, so slot 0 is passed
    through untouched (a bilinear sample at exact integer coords is a
    copy) — saves 1/L of the warp cost.
    """
    if method == "auto":
        method = "shear" if jax.default_backend() == "tpu" else "exact"

    if method == "shear":
        def per_agent(feat, m):
            return affine_warp_shear(feat, m)
    else:
        def per_agent(feat, m):
            return affine_warp(feat, m, align_corners)

    to_ego = affine[:, 0]  # (B, L, 2, 3)
    if skip_ego and features.shape[1] > 1:
        rest = jax.vmap(jax.vmap(per_agent))(
            features[:, 1:], to_ego[:, 1:]
        )
        return jnp.concatenate([features[:, :1], rest], axis=1)
    return jax.vmap(jax.vmap(per_agent))(features, to_ego)
