"""Fixed-shape rotated NMS on device (JAX/XLA).

TPU-native replacement for the CUDA bitmask NMS
(pcdet_utils/iou3d_nms/src/iou3d_nms_kernel.cu) and the host polygon loop
(box_utils.nms_rotated): score-sorted top-K candidates, a K×K rotated-IoU
matrix from the vectorized clipper (utils/rotated_iou.py, jnp backend), and
a K-step lax.fori_loop greedy sweep with masked vector updates. All shapes
static -> fully jit-able, batched via vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.rotated_iou import rotated_iou_matrix


def nms_rotated_fixed(
    corners_bev: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Greedy rotated NMS over a fixed-size candidate set.

    Parameters
    ----------
    corners_bev : (K, 4, 2) BEV corners, already score-sorted descending.
    scores : (K,) descending scores (used only for tie documentation).
    valid : (K,) bool — candidate validity (score threshold, range, ...).
    iou_threshold : suppress j if IoU(i, j) > threshold for a kept i < j.

    Returns (K,) bool keep mask.
    """
    k = corners_bev.shape[0]
    iou = rotated_iou_matrix(corners_bev, corners_bev, jnp)  # (K, K)

    def body(i, keep):
        # if candidate i survives, suppress all later overlapping candidates
        suppress = (iou[i] > iou_threshold) & (
            jnp.arange(k) > i
        )
        return jnp.where(keep[i], keep & ~suppress, keep)

    keep = jax.lax.fori_loop(0, k, body, valid)
    return keep


def topk_candidates(scores_flat: jnp.ndarray, k: int):
    """Top-k scores + indices (descending). scores_flat: (N,)."""
    vals, idx = jax.lax.top_k(scores_flat, k)
    return vals, idx
