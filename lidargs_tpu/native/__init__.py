"""ctypes bindings for the native host-side runtime ops (lidargs_native.cpp).

The shared object is built lazily on first use (g++, see build.py); every
entry point has a pure NumPy/JAX fallback so the package works without a
toolchain. `native_available()` reports which path is active.
"""
from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            from .build import ensure_built

            path = ensure_built()
            lib = ctypes.CDLL(path)
            lib.knn3_mean_sq_dist.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.voxel_unique.restype = ctypes.c_int32
            lib.voxel_unique.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int32, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ]
            lib.pano_to_points.restype = ctypes.c_int32
            lib.pano_to_points.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def knn3_mean_sq_dist(points: np.ndarray) -> np.ndarray:
    """distCUDA2 equivalent (simple-knn, SURVEY N10): mean squared distance
    to each point's 3 nearest neighbours. Grid-hash O(N) in C++; O(N^2)
    blocked JAX fallback."""
    pts = np.ascontiguousarray(points, np.float32)
    n = pts.shape[0]
    lib = _load()
    if lib is not None:
        out = np.empty((n,), np.float32)
        lib.knn3_mean_sq_dist(_fptr(pts), n, _fptr(out))
        return out
    from ..ops.knn import mean_sq_dist_3nn

    return mean_sq_dist_3nn(pts)


def voxel_unique(points: np.ndarray, voxel: float) -> np.ndarray:
    """np.unique(np.round(points / voxel), axis=0) * voxel, hash-set based."""
    pts = np.ascontiguousarray(points, np.float64)
    n = pts.shape[0]
    lib = _load()
    if lib is not None:
        out = np.empty((n, 3), np.float64)
        m = lib.voxel_unique(_dptr(pts), n, float(voxel), _dptr(out), n)
        return out[:m]
    return np.unique(np.round(pts / voxel), axis=0) * voxel


def pano_to_points(pano: np.ndarray, intensity: Optional[np.ndarray],
                   beams: np.ndarray) -> np.ndarray:
    """Range image -> [N, 4] (x, y, z, intensity) points in sensor frame
    (pano_to_lidar_with_intensities, utils/lidar_utils.py:171-231)."""
    H, W = pano.shape
    pano_f = np.ascontiguousarray(pano, np.float32)
    beams_f = np.ascontiguousarray(beams, np.float32)
    lib = _load()
    if lib is not None:
        inten_f = (np.ascontiguousarray(intensity, np.float32)
                   if intensity is not None else None)
        out = np.empty((H * W, 4), np.float32)
        cnt = lib.pano_to_points(
            _fptr(pano_f),
            _fptr(inten_f) if inten_f is not None else None,
            H, W, _fptr(beams_f), _fptr(out),
        )
        return out[:cnt]
    from ..lidar.pano import pano_to_lidar_with_intensities

    inten = intensity if intensity is not None else np.zeros_like(pano_f)
    return pano_to_lidar_with_intensities(pano_f, inten, beams_f)
