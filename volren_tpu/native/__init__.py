"""ctypes bindings for the native voldata kernels.

Builds lazily on first use (g++ is in the base image); every entry point
has a numpy fallback in volren_tpu.voldata.brick, so a missing toolchain
only costs speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libvoldata_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_DIR, "voldata_native.cpp")
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
            subprocess.run(
                ["make", "-s", "-C", _DIR], check=True, capture_output=True
            )
        lib = ctypes.CDLL(_LIB_PATH)
    except Exception:
        return None
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.vdn_build_brick_grid.restype = ctypes.c_int
    lib.vdn_build_brick_grid.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        u32p, f32p, u8p, ctypes.c_long,
    ]
    lib.vdn_range_mip.restype = None
    lib.vdn_range_mip.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.vdn_decode_dense.restype = None
    lib.vdn_decode_dense.argtypes = [
        u32p, f32p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def build_brick_grid_native(dense: np.ndarray):
    """dense (Z, Y, X) float32 -> (indirection (bz,by,bx) u32,
    range (bz,by,bx,2) f32, atlas (n_slots,8,8,8) u8) or None if the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    dense = np.ascontiguousarray(dense, np.float32)
    Z, Y, X = dense.shape
    bx, by, bz = -(-X // 8), -(-Y // 8), -(-Z // 8)
    nb = bx * by * bz
    indirection = np.zeros(nb, np.uint32)
    range_ = np.zeros(nb * 2, np.float32)
    atlas = np.zeros((max(nb, 1), 512), np.uint8)
    n = lib.vdn_build_brick_grid(dense, X, Y, Z, indirection, range_, atlas.reshape(-1), atlas.shape[0])
    if n < 0:
        return None
    return (
        indirection.reshape(bz, by, bx),
        range_.reshape(bz, by, bx, 2),
        atlas[:n].reshape(n, 8, 8, 8).copy(),
    )


def range_mips_native(range_: np.ndarray, n_mips: int = 3):
    lib = _load()
    if lib is None:
        return None
    mips = []
    cur = np.ascontiguousarray(range_, np.float32)
    for _ in range(n_mips):
        bz, by, bx = cur.shape[:3]
        nz, ny, nx = max(1, -(-bz // 2)), max(1, -(-by // 2)), max(1, -(-bx // 2))
        dst = np.zeros((nz, ny, nx, 2), np.float32)
        lib.vdn_range_mip(cur.reshape(-1), bx, by, bz, dst.reshape(-1), nx, ny, nz)
        mips.append(dst)
        cur = dst
    return mips
