"""ctypes bindings for the native host-side geo kernels (native/geokernels.cc).

Auto-builds the shared library on first use when g++ is available; every
function has a pure-numpy fallback so the framework never hard-depends on
the native build.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_ROOT = Path(__file__).resolve().parent.parent.parent
_SO = _ROOT / "native" / "build" / "libgeokernels.so"
_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        if not _SO.exists():
            subprocess.run(["sh", str(_ROOT / "scripts" / "build_native.sh")],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_SO))
        i64, f32 = ctypes.c_int64, ctypes.c_float
        fp = ctypes.POINTER(ctypes.c_float)
        lib.merge_tiles_f32.argtypes = [fp, fp, i64, i64, i64, i64]
        lib.mirror_pad_f32.argtypes = [fp, fp, i64, i64, i64, i64]
        lib.scale_elevation_f32.argtypes = [fp, i64, f32, f32, ctypes.c_int, f32]
        lib.descale_elevation_f32.argtypes = [fp, i64, f32, f32, ctypes.c_int]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def have_native() -> bool:
    return _lib() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def merge_tiles_native(tiles: np.ndarray, full_size: int) -> np.ndarray | None:
    """tiles: (n, k, k, c) float32; returns (full, full, c) or None."""
    lib = _lib()
    if lib is None:
        return None
    tiles = np.ascontiguousarray(tiles, np.float32)
    n, k, _, c = tiles.shape
    n_x = int(round(n**0.5))
    out = np.zeros((full_size, full_size, c), np.float32)
    lib.merge_tiles_f32(_ptr(tiles), _ptr(out), n_x, k, c, full_size)
    return out


def mirror_pad_native(img: np.ndarray, p: int) -> np.ndarray | None:
    lib = _lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    out = np.empty((h + 2 * p, w + 2 * p, c), np.float32)
    lib.mirror_pad_f32(_ptr(img), _ptr(out), h, w, c, p)
    return out


def scale_elevation_native(data: np.ndarray, elev_min, elev_max,
                           use_log: bool, base: float = 0.0):
    lib = _lib()
    if lib is None:
        return None
    out = np.ascontiguousarray(data, np.float32).copy()
    lib.scale_elevation_f32(_ptr(out), out.size, float(elev_min),
                            float(elev_max), int(use_log), float(base))
    return out


def descale_elevation_native(data: np.ndarray, elev_min, elev_max,
                             use_log: bool):
    lib = _lib()
    if lib is None:
        return None
    out = np.ascontiguousarray(data, np.float32).copy()
    lib.descale_elevation_f32(_ptr(out), out.size, float(elev_min),
                              float(elev_max), int(use_log))
    return out
