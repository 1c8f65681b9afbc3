"""Pred x GT IoU matrix — native C++ via ctypes with numpy fallback.

Replaces the Cython ``bbox_overlaps`` the reference builds from the external
WiderFace-Evaluation repo (eval/eval_official_widerface.py:20-33). The C++
source lives in native/bbox_overlaps.cpp and is compiled on first use (g++
-O3), cached next to the source. Semantics (the +1 inclusive-pixel convention)
match the official WIDERFACE evaluation script exactly.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "bbox_overlaps.cpp")
_SO = os.path.join(_NATIVE_DIR, "libbbox_overlaps.so")
_lock = threading.Lock()
_lib = None
_native_failed = False


def _load_native():
    global _lib, _native_failed
    if _lib is not None or _native_failed:
        return _lib
    with _lock:
        if _lib is not None or _native_failed:
            return _lib
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.bbox_overlaps.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.bbox_overlaps.restype = None
            _lib = lib
        except Exception:
            _native_failed = True
            _lib = None
    return _lib


def bbox_overlaps_numpy(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Vectorized fallback with identical (+1 inclusive) semantics."""
    boxes = np.asarray(boxes, np.float64)
    query = np.asarray(query, np.float64)
    iw = (
        np.minimum(boxes[:, None, 2], query[None, :, 2])
        - np.maximum(boxes[:, None, 0], query[None, :, 0])
        + 1.0
    )
    ih = (
        np.minimum(boxes[:, None, 3], query[None, :, 3])
        - np.maximum(boxes[:, None, 1], query[None, :, 1])
        + 1.0
    )
    inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
    inter[(iw <= 0) | (ih <= 0)] = 0.0
    b_area = (boxes[:, 2] - boxes[:, 0] + 1.0) * (boxes[:, 3] - boxes[:, 1] + 1.0)
    q_area = (query[:, 2] - query[:, 0] + 1.0) * (query[:, 3] - query[:, 1] + 1.0)
    union = b_area[:, None] + q_area[None, :] - inter
    return inter / union


def bbox_overlaps(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
    """IoU matrix [n, k] between boxes [n, 4] and query [k, 4] (xyxy)."""
    boxes = np.ascontiguousarray(boxes, np.float64)
    query = np.ascontiguousarray(query, np.float64)
    n, k = boxes.shape[0], query.shape[0]
    if n == 0 or k == 0:
        return np.zeros((n, k), np.float64)
    lib = _load_native()
    if lib is None:
        return bbox_overlaps_numpy(boxes, query)
    out = np.empty((n, k), np.float64)
    lib.bbox_overlaps(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        query.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
