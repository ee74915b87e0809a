"""ctypes bindings for the native host pipeline (native/libmisst_host.so).

Auto-builds the library on first use if the toolchain is present; all
callers fall back to the pure-Python implementations when unavailable, so
the framework never hard-depends on the native tier."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libmisst_host.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("MISST_DISABLE_NATIVE"):
            return None
        if not _LIB_PATH.exists():
            try:
                subprocess.run(
                    ["make", "-C", str(_NATIVE_DIR)], check=True,
                    capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        lib.misst_decode_png_gray8.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.misst_decode_png_gray8.restype = ctypes.c_int
        lib.misst_augment_pair.argtypes = [
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_void_p,  # gt or NULL
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_void_p,  # out_gt or NULL
        ]
        lib.misst_augment_pair.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


MAX_SIDE = 2048


def decode_png_gray8(data: bytes) -> Optional[np.ndarray]:
    """Decode an 8-bit grayscale PNG; None if unsupported/unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(MAX_SIDE * MAX_SIDE, np.uint8)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    rc = lib.misst_decode_png_gray8(data, len(data), out, ctypes.byref(h),
                                    ctypes.byref(w), out.size)
    if rc != 0:
        return None
    return out[: h.value * w.value].reshape(h.value, w.value).copy()


def augment_pair(
    img: np.ndarray,
    gt: Optional[np.ndarray],
    angle: float,
    vflip: bool,
    hflip: bool,
    crop_y: int,
    crop_x: int,
    crop: int,
    brightness: float = -1.0,
    contrast: float = 1.0,
) -> Optional[Tuple[np.ndarray, Optional[np.ndarray]]]:
    """Fused rotate+flip+crop+jitter; brightness < 0 disables jitter.
    Returns None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    h, w = img.shape
    out_img = np.empty((crop, crop), np.float32)
    out_gt = None
    gt_ptr = None
    out_gt_ptr = None
    if gt is not None:
        gt = np.ascontiguousarray(gt, np.int32)
        out_gt = np.empty((crop, crop), np.int32)
        gt_ptr = gt.ctypes.data_as(ctypes.c_void_p)
        out_gt_ptr = out_gt.ctypes.data_as(ctypes.c_void_p)
    rc = lib.misst_augment_pair(
        img, gt_ptr, h, w, float(angle), int(vflip), int(hflip),
        int(crop_y), int(crop_x), int(crop), float(brightness), float(contrast),
        out_img, out_gt_ptr,
    )
    if rc != 0:
        return None
    return out_img, out_gt
