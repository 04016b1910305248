"""Native (C++) host-side kernels: marching cubes, KD-tree nearest neighbor.

Built as a shared library via `python native/build.py` (see /native at the
repo root); loaded through ctypes. Importing raises if the library is not
built — callers fall back to skimage/scipy implementations.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgennerf_native.so")


def _load_or_build():
    if os.path.exists(_LIB_PATH):
        try:
            return ctypes.CDLL(_LIB_PATH)
        except OSError:
            pass  # stale/incompatible binary — rebuild below
    import subprocess
    import sys

    subprocess.run(
        [sys.executable, os.path.join(_NATIVE_DIR, "build.py")],
        check=True, capture_output=True,
    )
    return ctypes.CDLL(_LIB_PATH)


_lib = _load_or_build()

_lib.marching_cubes.restype = ctypes.c_int
_lib.marching_cubes.argtypes = [
    ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
]
_lib.free_buffer.restype = None
_lib.free_buffer.argtypes = [ctypes.c_void_p]

_lib.nn_distances.restype = None
_lib.nn_distances.argtypes = [
    ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ctypes.POINTER(ctypes.c_float),
]

_lib.rasterize_depth.restype = None
_lib.rasterize_depth.argtypes = [
    ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ctypes.POINTER(ctypes.c_float),
    ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.c_float),
]


def marching_cubes(volume: np.ndarray, level: float = 0.0):
    """Extract the `level` isosurface of a (nx, ny, nz) float volume.

    Returns (verts (V, 3) float32, faces (F, 3) int32) in voxel coordinates,
    compatible with skimage.measure.marching_cubes output.
    """
    vol = np.ascontiguousarray(volume, dtype=np.float32)
    nx, ny, nz = vol.shape
    verts_p = ctypes.POINTER(ctypes.c_float)()
    faces_p = ctypes.POINTER(ctypes.c_int)()
    nv = ctypes.c_int()
    nf = ctypes.c_int()
    rc = _lib.marching_cubes(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, ctypes.c_float(level),
        ctypes.byref(verts_p), ctypes.byref(faces_p),
        ctypes.byref(nv), ctypes.byref(nf),
    )
    if rc != 0:
        raise RuntimeError("native marching cubes failed")
    try:
        verts = np.ctypeslib.as_array(verts_p, shape=(nv.value, 3)).copy()
        faces = np.ctypeslib.as_array(faces_p, shape=(nf.value, 3)).copy()
    finally:
        _lib.free_buffer(verts_p)
        _lib.free_buffer(faces_p)
    return verts, faces


def rasterize_depth(
    vertices: np.ndarray,
    faces: np.ndarray,
    intrinsics: np.ndarray,
    pose: np.ndarray,
    height: int,
    width: int,
) -> np.ndarray:
    """Software z-buffer rasterization of a mesh into a pinhole camera
    (the pyrender-offscreen replacement used by offline evaluation).

    Args:
        vertices: (V, 3) world-space.
        faces: (F, 3) int.
        intrinsics: (3, 3) K.
        pose: (4, 4) camera2world.

    Returns:
        (H, W) float32 z-depth, 0 where empty.
    """
    v = np.ascontiguousarray(vertices, dtype=np.float32)
    f = np.ascontiguousarray(faces, dtype=np.int32)
    w2c = np.ascontiguousarray(np.linalg.inv(np.asarray(pose, np.float64)).astype(np.float32))
    K = np.asarray(intrinsics, np.float64)
    out = np.zeros((height, width), dtype=np.float32)
    _lib.rasterize_depth(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(f),
        w2c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(K[0, 0]), ctypes.c_float(K[1, 1]),
        ctypes.c_float(K[0, 2]), ctypes.c_float(K[1, 2]),
        height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def nn_distances(queries: np.ndarray, targets: np.ndarray) -> np.ndarray:
    """For each query point, distance to its nearest target point (KD-tree)."""
    q = np.ascontiguousarray(queries, dtype=np.float32)
    t = np.ascontiguousarray(targets, dtype=np.float32)
    out = np.empty(len(q), dtype=np.float32)
    _lib.nn_distances(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(q),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(t),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
