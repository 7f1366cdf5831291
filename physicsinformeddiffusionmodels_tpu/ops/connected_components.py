"""Floating-material detection via connected components (host-side).

Equivalent of the reference's cv2.connectedComponents usage
(`/root/reference/src/residuals_mechanics_K.py:369-380`): a binarized
density image has "floating material" iff the solid phase (> 0.5) has more
than one 8-connected component (cv2 returns background + components; its
``retval != 2`` check is exactly "solid components != 1" whenever voids
exist, and all-solid images are not floating either way).

Primary implementation: the C++ union-find in native/connected_components.cpp
(built on first use with g++, cached next to the source). Fallback: a pure
NumPy BFS with identical semantics.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SRC = _NATIVE_DIR / "connected_components.cpp"
_LIB = _NATIVE_DIR / "libpidm_cc.so"

_lib = None
_lib_failed = False


def _load_native():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB))
        lib.pidm_floating_material.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.pidm_count_components.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_float,
        ]
        lib.pidm_count_components.restype = ctypes.c_int32
        _lib = lib
    except (subprocess.CalledProcessError, OSError):
        _lib_failed = True
    return _lib


def count_components_numpy(img: np.ndarray, threshold: float = 0.5) -> int:
    """8-connected components of {img > threshold} (BFS fallback)."""
    solid = img > threshold
    seen = np.zeros_like(solid, bool)
    h, w = solid.shape
    count = 0
    for i in range(h):
        for j in range(w):
            if not solid[i, j] or seen[i, j]:
                continue
            count += 1
            stack = [(i, j)]
            seen[i, j] = True
            while stack:
                ci, cj = stack.pop()
                for di in (-1, 0, 1):
                    for dj in (-1, 0, 1):
                        ni, nj = ci + di, cj + dj
                        if 0 <= ni < h and 0 <= nj < w and solid[ni, nj] and not seen[ni, nj]:
                            seen[ni, nj] = True
                            stack.append((ni, nj))
    return count


def count_components(img: np.ndarray, threshold: float = 0.5) -> int:
    img = np.ascontiguousarray(img, np.float32)
    lib = _load_native()
    if lib is None:
        return count_components_numpy(img, threshold)
    h, w = img.shape
    return int(
        lib.pidm_count_components(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, threshold
        )
    )


def floating_material(imgs: np.ndarray, threshold: float = 0.5) -> np.ndarray:
    """Batched fm flags: 1 iff solid-component count != 1
    (`residuals_mechanics_K.py:345-347,369-380`)."""
    imgs = np.ascontiguousarray(imgs, np.float32)
    b, h, w = imgs.shape
    lib = _load_native()
    if lib is None:
        return np.array(
            [int(count_components_numpy(imgs[i], threshold) != 1) for i in range(b)],
            np.int32,
        )
    out = np.zeros(b, np.int32)
    lib.pidm_floating_material(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b, h, w, threshold,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
