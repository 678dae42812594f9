"""ctypes bindings for the native C++ data-plane (native/dataplane.cpp).

Builds the shared library on first use (g++, cached next to the source);
falls back to cv2/NumPy transparently if the toolchain is unavailable, so
the framework never hard-depends on the native path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "dataplane.cpp")
_LIB = os.path.join(_REPO, "native", "libdataplane.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", _LIB, "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if os.environ.get("KD6D_NO_NATIVE"):  # force the cv2/NumPy fallback
        return None
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
        if not os.path.exists(_SRC) or not _build():
            return None
    lib = ctypes.CDLL(_LIB)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    c = ctypes.c_int
    lib.warp_affine_u8.argtypes = [u8p, c, c, c, u8p, c, c, f64p, u8p, c]
    lib.warp_affine_i32.argtypes = [i32p, c, c, i32p, c, c, f64p, ctypes.c_int32, c]
    lib.normalize_bgr_u8.argtypes = [u8p, c, c, f32p, f32p, f32p, c]
    _lib = lib
    return _lib


def warp_affine_u8(src: np.ndarray, M: np.ndarray, out_hw, border=(0, 0, 0),
                   n_threads: int = 1) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    if src.ndim == 2:
        src = src[:, :, None]
    dh, dw = out_hw
    dst = np.empty((dh, dw, src.shape[2]), np.uint8)
    b = np.ascontiguousarray(np.asarray(border, np.uint8)[: src.shape[2]])
    lib.warp_affine_u8(src, src.shape[0], src.shape[1], src.shape[2],
                       dst, dh, dw,
                       np.ascontiguousarray(M[:2].reshape(-1), np.float64),
                       b, n_threads)
    return dst


def warp_affine_i32(src: np.ndarray, M: np.ndarray, out_hw, border: int = 0,
                    n_threads: int = 1) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int32)
    dh, dw = out_hw
    dst = np.empty((dh, dw), np.int32)
    lib.warp_affine_i32(src, src.shape[0], src.shape[1], dst, dh, dw,
                        np.ascontiguousarray(M[:2].reshape(-1), np.float64),
                        border, n_threads)
    return dst


def normalize_bgr_u8(img: np.ndarray, mean, std, n_threads: int = 1
                     ) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((img.shape[0], img.shape[1], 3), np.float32)
    lib.normalize_bgr_u8(img, img.shape[0], img.shape[1],
                         np.ascontiguousarray(mean, np.float32),
                         np.ascontiguousarray(std, np.float32), out, n_threads)
    return out
