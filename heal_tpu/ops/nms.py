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

    # Greedy NMS solves the triangular recurrence
    #   keep_j = valid_j & not any_{i<j}(keep_i & iou_ij > thr).
    # A K-step sequential sweep is latency-bound on TPU (~K x few us), so
    # we iterate the recurrence as a fixpoint instead: any fixpoint equals
    # the greedy solution (strong induction over j), and each iteration
    # extends the correct prefix by at least one index — in practice whole
    # non-conflicting chains resolve at once, so it converges in ~chain
    # depth (3-6) iterations of one (K,K) masked matvec each.
    sup = (
        (iou > iou_threshold)
        & (jnp.arange(k)[:, None] < jnp.arange(k)[None, :])
    ).astype(jnp.float32)  # sup[i, j]: kept i would suppress later j

    def cond(state):
        t, keep, changed = state
        return changed & (t < k)

    def body(state):
        t, keep, _ = state
        hit = keep.astype(jnp.float32) @ sup  # any kept suppressor?
        new = valid & (hit < 0.5)
        return t + 1, new, jnp.any(new != keep)

    _, keep, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), valid, jnp.bool_(True))
    )
    return keep


def topk_candidates(scores_flat: jnp.ndarray, k: int):
    """Top-k scores + indices (descending). scores_flat: (N,)."""
    vals, idx = jax.lax.top_k(scores_flat, k)
    return vals, idx
