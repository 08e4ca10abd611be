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


def warp_agents_to_ego(
    features: jnp.ndarray, affine: jnp.ndarray, align_corners: bool = False
):
    """Warp every agent's BEV map into the ego (slot-0) frame.

    features: (B, L, H, W, C); affine: (B, L, L, 2, 3) normalized pairwise
    matrices (affine[b, 0, j] maps ego pixel coords into agent j's frame,
    exactly the matrix the reference passes as ``t_matrix[0, j]``).
    Returns (B, L, H, W, C).
    """
    def per_agent(feat, m):
        return affine_warp(feat, m, align_corners)

    def per_batch(feats, affs):
        return jax.vmap(per_agent)(feats, affs[0])

    return jax.vmap(per_batch)(features, affine)
