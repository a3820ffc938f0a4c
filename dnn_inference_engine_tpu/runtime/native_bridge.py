"""ctypes bridge to the native C++ host library (native/host_ops.cpp).

The reference's runtime-side native code (image handling, host NMS — its
K9 FFI bridge role, SURVEY.md section 2.1) maps on TPU to host-side C++
for the pieces that stay on the host: bilinear resize/normalize and the
host NMS oracle. Device compute is Pallas/XLA; this library never touches
tensors on device.

The bridge degrades gracefully: if the .so is absent it tries one `make`
in native/, then falls back to numpy (callers treat None as "use numpy").
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libhost_ops.so")

_lib = None
_lib_lock = threading.Lock()
_load_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    with _lib_lock:
        if _lib is not None or _load_attempted:
            return _lib
        _load_attempted = True
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               capture_output=True, timeout=120, check=False)
            except Exception:
                pass
        if not os.path.exists(_SO_PATH):
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.resize_bilinear_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.c_int]
            lib.resize_bilinear_f32.restype = None
            lib.nms_greedy.argtypes = [
                ctypes.POINTER(ctypes.c_float),   # boxes xyxy (M,4)
                ctypes.POINTER(ctypes.c_float),   # scores (M,)
                ctypes.c_int,                     # M
                ctypes.c_float, ctypes.c_float,   # iou_thresh, score_thresh
                ctypes.POINTER(ctypes.c_int),     # out keep indices
                ctypes.c_int]                     # max_det
            lib.nms_greedy.restype = ctypes.c_int
            lib.preprocess_u8.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.c_int]
            lib.preprocess_u8.restype = None
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def native_resize(img: np.ndarray, out_h: int, out_w: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(img, np.float32)
    h, w = src.shape[:2]
    c = src.shape[2] if src.ndim == 3 else 1
    dst = np.empty((out_h, out_w, c), np.float32)
    lib.resize_bilinear_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_h, out_w)
    if img.ndim == 2:
        dst = dst[..., 0]
    return dst


def native_preprocess_u8(img: np.ndarray, out_h: int,
                         out_w: int) -> Optional[np.ndarray]:
    """uint8 HWC -> resized f32 HWC in [0,1], fused in C++."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(img, np.uint8)
    h, w, c = src.shape
    dst = np.empty((out_h, out_w, c), np.float32)
    lib.preprocess_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_h, out_w)
    return dst


def native_nms(boxes_xyxy: np.ndarray, scores: np.ndarray,
               iou_thresh: float, score_thresh: float,
               max_det: int) -> Optional[np.ndarray]:
    """Greedy class-agnostic NMS on sorted candidates; returns keep indices."""
    lib = _load()
    if lib is None:
        return None
    b = np.ascontiguousarray(boxes_xyxy, np.float32)
    s = np.ascontiguousarray(scores, np.float32)
    keep = np.empty((max_det,), np.int32)
    n = lib.nms_greedy(
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(s), ctypes.c_float(iou_thresh), ctypes.c_float(score_thresh),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), max_det)
    return keep[:n]
