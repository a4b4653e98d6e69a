"""ctypes bindings for the native C++ host-side helpers (native/).

Build: `python -m fourdgs_tpu.native.build` (cmake+ninja or direct g++).
All users fall back to the pure-Python parsers when the library is absent,
so the native path is a transparent accelerator, never a requirement.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    for name in ("libcolmap_native.so", "colmap_native.so"):
        p = os.path.join(here, name)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.colmap_count_points3d.restype = ctypes.c_int64
            lib.colmap_count_points3d.argtypes = [ctypes.c_char_p]
            lib.colmap_read_points3d.restype = ctypes.c_int64
            lib.colmap_read_points3d.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64]
            lib.colmap_count_images.restype = ctypes.c_int64
            lib.colmap_count_images.argtypes = [ctypes.c_char_p]
            lib.colmap_read_image_poses.restype = ctypes.c_int64
            lib.colmap_read_image_poses.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


def read_points3d_binary(path: str):
    """Native points3D.bin parse -> (xyz, rgb, err) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = lib.colmap_count_points3d(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty(n, np.float64)
    got = lib.colmap_read_points3d(
        path.encode(), xyz.ctypes.data_as(ctypes.c_void_p),
        rgb.ctypes.data_as(ctypes.c_void_p),
        err.ctypes.data_as(ctypes.c_void_p), n)
    if got != n:
        raise IOError(f"native parse of {path} failed at record {got}")
    return xyz, rgb.astype(np.float64), err


def read_image_poses_binary(path: str, name_cap: int = 256):
    """Native images.bin parse -> (ids, qvec, tvec, cam_ids, names) or None."""
    lib = _load()
    if lib is None:
        return None
    n = lib.colmap_count_images(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    ids = np.empty(n, np.int32)
    qvec = np.empty((n, 4), np.float64)
    tvec = np.empty((n, 3), np.float64)
    cam_ids = np.empty(n, np.int32)
    names = np.zeros(n * name_cap, np.uint8)
    got = lib.colmap_read_image_poses(
        path.encode(), ids.ctypes.data_as(ctypes.c_void_p),
        qvec.ctypes.data_as(ctypes.c_void_p),
        tvec.ctypes.data_as(ctypes.c_void_p),
        cam_ids.ctypes.data_as(ctypes.c_void_p),
        names.ctypes.data_as(ctypes.c_void_p), name_cap, n)
    if got != n:
        raise IOError(f"native parse of {path} failed at record {got}")
    name_list = [bytes(names[i * name_cap:(i + 1) * name_cap])
                 .split(b"\0", 1)[0].decode("utf-8") for i in range(n)]
    return ids, qvec, tvec, cam_ids, name_list
