"""Native (C++) host data-loader core with ctypes bindings.

Replaces the reference's host-side native pieces (SURVEY.md §2.7):
Cython ``bbox_overlaps`` (anchor target assignment IoU), the spconv CPU
voxelizer, and pypcd PCD parsing — the data-pipeline hot loops on this
single-core host. Falls back to the numpy implementations transparently
when the library hasn't been built (``python -m heal_tpu.native.build``).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libheal_loader.so")


def available() -> bool:
    return load() is not None


def load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.bbox_overlaps.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64, f32p, ctypes.c_int
    ]
    lib.range_filter_pad.restype = ctypes.c_int64
    lib.range_filter_pad.argtypes = [
        f32p, ctypes.c_int64, f32p, f32p, u8p, ctypes.c_int64
    ]
    lib.read_pcd.restype = ctypes.c_int64
    lib.read_pcd.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int64]
    lib.voxelize.restype = ctypes.c_int64
    lib.voxelize.argtypes = [
        f32p, ctypes.c_int64, f32p, f32p, ctypes.c_int64, ctypes.c_int64,
        f32p, i32p, i32p,
    ]
    _LIB = lib
    return lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def bbox_overlaps(boxes: np.ndarray, query: np.ndarray, plus_one=True):
    """(N, 4) x (K, 4) -> (N, K) IoU matrix (native; numpy fallback)."""
    lib = load()
    if lib is None:
        from ..utils.box_np import standup_iou_matrix

        return standup_iou_matrix(boxes, query, plus_one).astype(np.float32)
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    query = np.ascontiguousarray(query, dtype=np.float32)
    out = np.empty((len(boxes), len(query)), dtype=np.float32)
    lib.bbox_overlaps(
        _fp(boxes), len(boxes), _fp(query), len(query), _fp(out),
        1 if plus_one else 0,
    )
    return out


def read_pcd(path: str, cap: int = 200_000):
    """PCD file -> (N, 4) float32 (native; numpy fallback).

    The native reader returns the file's total point count; when it
    exceeds the buffer the read is retried with a grown buffer so native
    and fallback paths return identical data (no silent truncation).
    """
    lib = load()
    if lib is None:
        from ..data.opv2v import load_pcd

        return load_pcd(path)
    while True:
        out = np.empty((cap, 4), dtype=np.float32)
        n = lib.read_pcd(path.encode(), _fp(out), cap)
        if n < 0:
            raise IOError(f"failed to read pcd {path}")
        if n <= cap:
            return out[:n].copy()
        cap = int(n)


def range_filter_pad(points: np.ndarray, limit_range, max_out: int):
    """Filter to range and pad to max_out. -> (points, mask)."""
    lib = load()
    pts = np.ascontiguousarray(points, dtype=np.float32)
    if lib is None:
        r = limit_range
        m = (
            (pts[:, 0] >= r[0]) & (pts[:, 0] <= r[3])
            & (pts[:, 1] >= r[1]) & (pts[:, 1] <= r[4])
            & (pts[:, 2] >= r[2]) & (pts[:, 2] <= r[5])
        )
        sel = pts[m][:max_out]
        out = np.zeros((max_out, 4), np.float32)
        mask = np.zeros(max_out, bool)
        out[: len(sel)] = sel
        mask[: len(sel)] = True
        return out, mask
    out = np.empty((max_out, 4), dtype=np.float32)
    mask = np.empty(max_out, dtype=np.uint8)
    rng = np.asarray(limit_range, dtype=np.float32)
    lib.range_filter_pad(
        _fp(pts), len(pts), _fp(rng), _fp(out),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), max_out,
    )
    return out, mask.astype(bool)


def voxelize(points, limit_range, voxel_size, max_voxels, max_points):
    """spconv-style host voxelization -> (voxels, coords, counts)."""
    lib = load()
    assert lib is not None, "build the native lib first"
    pts = np.ascontiguousarray(points, dtype=np.float32)
    rng = np.asarray(limit_range, dtype=np.float32)
    vs = np.asarray(voxel_size, dtype=np.float32)
    voxels = np.zeros((max_voxels, max_points, 4), dtype=np.float32)
    coords = np.zeros((max_voxels, 3), dtype=np.int32)
    counts = np.zeros(max_voxels, dtype=np.int32)
    used = lib.voxelize(
        _fp(pts), len(pts), _fp(rng), _fp(vs), max_voxels, max_points,
        _fp(voxels),
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return voxels[:used], coords[:used], counts[:used]
