"""Native data-loader kernels (C via ctypes), with transparent fallback.

Builds lbc_tpu/native/_fastloader.so from fastloader.c with the system
compiler on first use; every entry point falls back to the numpy/cv2
implementation when the toolchain or the .so is unavailable.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_SO = _HERE / '_fastloader.so'
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> bool:
    src = _HERE / 'fastloader.c'
    for cc in ('cc', 'gcc', 'clang'):
        try:
            subprocess.run(
                [cc, '-O3', '-shared', '-fPIC', '-o', str(_SO), str(src),
                 '-lm'],
                check=True, capture_output=True, timeout=120)
            return True
        except (subprocess.SubprocessError, FileNotFoundError):
            continue
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not _SO.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.unpack_birdview_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64]
        lib.pack_birdview_u8.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64]
        lib.rotate_nearest_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_float,
            ctypes.c_float, ctypes.c_float]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def unpack_birdview_native(packed: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, np.uint8)
    out = np.empty(packed.shape + (7,), np.float32)
    lib.unpack_birdview_f32(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(packed.size))
    return out


def pack_birdview_native(bv: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    bv = np.ascontiguousarray(bv, np.float32)
    assert bv.shape[-1] == 7
    out = np.empty(bv.shape[:-1], np.uint8)
    lib.pack_birdview_u8(
        bv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(out.size))
    return out


def rotate_nearest_native(plane: np.ndarray, cx: float, cy: float,
                          deg: float) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    plane = np.ascontiguousarray(plane, np.uint8)
    h, w = plane.shape
    out = np.empty_like(plane)
    lib.rotate_nearest_u8(
        plane.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(h), ctypes.c_int32(w),
        ctypes.c_float(cx), ctypes.c_float(cy), ctypes.c_float(deg))
    return out
