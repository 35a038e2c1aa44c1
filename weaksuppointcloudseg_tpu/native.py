"""ctypes bindings for the native host-side batcher (native/batcher.cc).

Build with ``scripts/build_native.sh``; every function transparently falls
back to the vectorized numpy implementation when the shared library is
absent, so the package works from a plain checkout. ``HAVE_NATIVE`` reports
which path is active.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native", "libbatcher.so")
_lib = None
if os.path.exists(_LIB_PATH):
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
        _i64 = ctypes.c_int64
        _f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        _i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        _i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        _lib.onehot_f32.argtypes = [_i32p, _i64, _i64, _f32p]
        _lib.interleave_dup_f32.argtypes = [_f32p, _i64, _i64, _f32p]
        _lib.interleave_dup_i32.argtypes = [_i32p, _i64, _i64, _i32p]
        _lib.build_mask_f32.argtypes = [_i64p, _i64p, _i64, _i64, _f32p]
        _lib.siamese_onehot_f32.argtypes = [_i32p, _i64, _i64, _i64, _f32p]
    except OSError:
        _lib = None

HAVE_NATIVE = _lib is not None


def onehot(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """Integer labels (any shape) -> one-hot f32 (shape + [num_classes])."""
    labels = np.ascontiguousarray(labels, np.int32)
    out_shape = labels.shape + (num_classes,)
    if _lib is None:
        return np.eye(num_classes, dtype=np.float32)[labels]
    out = np.empty(out_shape, np.float32)
    _lib.onehot_f32(labels.reshape(-1), labels.size, num_classes,
                    out.reshape(-1, num_classes))
    return out


def interleave_duplicate(arr: np.ndarray) -> np.ndarray:
    """[B, ...] -> [2B, ...] with rows duplicated (Siamese pairs)."""
    if _lib is None or arr.dtype not in (np.float32, np.int32):
        return np.repeat(arr, 2, axis=0)
    arr = np.ascontiguousarray(arr)
    out = np.empty((2 * arr.shape[0],) + arr.shape[1:], arr.dtype)
    row = int(np.prod(arr.shape[1:], dtype=np.int64))
    if arr.dtype == np.float32:
        _lib.interleave_dup_f32(arr.reshape(arr.shape[0], -1), arr.shape[0],
                                row, out.reshape(out.shape[0], -1))
    else:
        _lib.interleave_dup_i32(arr.reshape(arr.shape[0], -1), arr.shape[0],
                                row, out.reshape(out.shape[0], -1))
    return out


def build_mask(pts_idx: Sequence[np.ndarray], sample_ids: Sequence[int],
               num_points: int) -> np.ndarray:
    """Binary [B, N] labelled-point mask from per-sample index lists."""
    rows: List[np.ndarray] = [
        np.asarray(pts_idx[s]).reshape(-1).astype(np.int64) for s in sample_ids
    ]
    if _lib is None:
        mask = np.zeros((len(rows), num_points), np.float32)
        for i, r in enumerate(rows):
            mask[i, r] = 1.0
        return mask
    flat = np.concatenate(rows) if rows else np.zeros(0, np.int64)
    offsets = np.zeros(len(rows) + 1, np.int64)
    np.cumsum([len(r) for r in rows], out=offsets[1:])
    mask = np.empty((len(rows), num_points), np.float32)
    _lib.build_mask_f32(np.ascontiguousarray(flat),
                        np.ascontiguousarray(offsets),
                        len(rows), num_points, mask)
    return mask


def siamese_onehot(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """[B, N] int labels -> [2B, N, K] one-hot with duplicated pairs, fused
    in one pass (replaces onehot + interleave_duplicate)."""
    labels = np.ascontiguousarray(labels, np.int32)
    b, n = labels.shape
    if _lib is None:
        return np.repeat(np.eye(num_classes, dtype=np.float32)[labels], 2, 0)
    out = np.empty((2 * b, n, num_classes), np.float32)
    _lib.siamese_onehot_f32(labels, b, n, num_classes, out)
    return out
