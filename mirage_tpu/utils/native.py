"""ctypes bindings for the native fast-ops library (native/fastops.cpp).

Loads ``native/libmirage_fastops.so`` if present (``make -C native``),
building it on first use when a compiler is available; every entry point has
a numpy fallback so the package works without the native build (CI, wheels).
"""

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmirage_fastops.so"))

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.resize_bilinear_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_int]
        lib.resize_nearest_i32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_long]
        lib.u8_to_f32_scaled.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_float]
        lib.minmax_norm_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long]
        lib.affine_warp_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_float]
        assert lib.fastops_version() >= 1
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def resize_bilinear(x: np.ndarray, out_hw, align_corners=False) -> Optional[np.ndarray]:
    """(..., H, W) float32 -> (..., oh, ow); None if native lib unavailable."""
    lib = _load()
    if lib is None or x.dtype != np.float32:
        return None
    lead = x.shape[:-2]
    ih, iw = x.shape[-2:]
    oh, ow = out_hw
    xin = np.ascontiguousarray(x).reshape(-1, ih, iw)
    out = np.empty((xin.shape[0], oh, ow), np.float32)
    lib.resize_bilinear_f32(xin.ctypes.data, out.ctypes.data, xin.shape[0],
                            ih, iw, oh, ow, int(align_corners))
    return out.reshape(*lead, oh, ow)


def resize_nearest(x: np.ndarray, out_hw) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None or not np.issubdtype(x.dtype, np.integer):
        return None
    lead = x.shape[:-2]
    ih, iw = x.shape[-2:]
    oh, ow = out_hw
    xin = np.ascontiguousarray(x.astype(np.int32)).reshape(-1, ih, iw)
    out = np.empty((xin.shape[0], oh, ow), np.int32)
    lib.resize_nearest_i32(xin.ctypes.data, out.ctypes.data, xin.shape[0],
                           ih, iw, oh, ow)
    return out.reshape(*lead, oh, ow).astype(x.dtype)


def u8_to_f32(x: np.ndarray, scale: float = 1.0 / 255.0) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None or x.dtype != np.uint8:
        return None
    xin = np.ascontiguousarray(x)
    out = np.empty(x.shape, np.float32)
    lib.u8_to_f32_scaled(xin.ctypes.data, out.ctypes.data, x.size, scale)
    return out


def affine_warp(x: np.ndarray, matrix: np.ndarray, offset: np.ndarray,
                *, order: int = 1, cval: float = 0.0) -> Optional[np.ndarray]:
    """Batched inverse-affine warp of (..., H, W) f32 planes. matrix: (2, 2)
    [[m_yy, m_yx], [m_xy, m_xx]], offset: (2,) in (y, x) order — the same
    parameterization scipy.ndimage.affine_transform takes."""
    lib = _load()
    if lib is None:
        return None
    orig_dtype = x.dtype
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    xin = np.ascontiguousarray(x, np.float32).reshape(-1, h, w)
    b = xin.shape[0]
    mats = np.ascontiguousarray(
        np.broadcast_to(np.asarray(matrix, np.float64).reshape(4), (b, 4)))
    offs = np.ascontiguousarray(
        np.broadcast_to(np.asarray(offset, np.float64).reshape(2), (b, 2)))
    out = np.empty_like(xin)
    lib.affine_warp_f32(xin.ctypes.data, out.ctypes.data, b, h, w,
                        mats.ctypes.data, offs.ctypes.data, int(order),
                        float(cval))
    out = out.reshape(*lead, h, w)
    if np.issubdtype(orig_dtype, np.integer):
        return np.round(out).astype(orig_dtype)
    return out.astype(orig_dtype)


def minmax_norm_inplace(x: np.ndarray) -> Optional[np.ndarray]:
    """Per-leading-plane [(..., H, W)] min-max to [0,1], in place."""
    lib = _load()
    if lib is None or x.dtype != np.float32 or not x.flags.c_contiguous:
        return None
    plane = x.shape[-2] * x.shape[-1]
    lib.minmax_norm_f32(x.ctypes.data, x.size // plane, plane)
    return x
