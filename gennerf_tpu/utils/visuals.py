"""Mesh visualization: shaded offscreen renders for logging.

Reference: src/utils/visuals.py (pyrender/EGL offscreen rendering of
reconstructions for wandb image logs, reference model.py:718-749). Here the
native software rasterizer does the shading — no GL stack required.
"""
from __future__ import annotations

from typing import Optional, Tuple

import ctypes

import numpy as np

from .mesh import Mesh


def render_mesh(
    mesh: Mesh,
    intrinsics: np.ndarray,
    pose: np.ndarray,
    height: int,
    width: int,
    color: Tuple[float, float, float] = (0.75, 0.75, 0.75),
    light_dir: Tuple[float, float, float] = (0.4, 0.3, 0.85),
) -> Tuple[np.ndarray, np.ndarray]:
    """Render a lambert-shaded view of the mesh.

    Args:
        intrinsics: (3, 3); pose: (4, 4) camera2world.

    Returns:
        rgb (H, W, 3) uint8 (white background), depth (H, W) float32.
    """
    from ..native import _lib

    if mesh.is_empty:
        return (np.full((height, width, 3), 255, np.uint8),
                np.zeros((height, width), np.float32))

    _lib.rasterize_shaded.restype = None
    _lib.rasterize_shaded.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_float),
    ]
    v = np.ascontiguousarray(mesh.vertices, np.float32)
    f = np.ascontiguousarray(mesh.faces, np.int32)
    w2c = np.ascontiguousarray(np.linalg.inv(np.asarray(pose, np.float64)).astype(np.float32))
    K = np.asarray(intrinsics, np.float64)
    base = np.asarray(color, np.float32)
    light = np.asarray(light_dir, np.float32)
    rgb = np.zeros((height, width, 3), np.uint8)
    depth = np.zeros((height, width), np.float32)
    _lib.rasterize_shaded(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(f),
        w2c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(K[0, 0]), ctypes.c_float(K[1, 1]),
        ctypes.c_float(K[0, 2]), ctypes.c_float(K[1, 2]),
        height, width,
        base.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        light.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return rgb, depth


def compute_camera_pose(
    mesh: Mesh, intrinsics: np.ndarray, width: int, height: int, margin: float = 0.8
) -> np.ndarray:
    """Auto-frame an overview camera looking at the mesh center from above
    (reference visuals.py:149-206)."""
    from ..data.synthetic import look_at_pose

    if mesh.is_empty:
        return look_at_pose([2.0, 2.0, 2.0], [0, 0, 0])
    lo, hi = mesh.bounds()
    center = (lo + hi) / 2
    extent = float(np.linalg.norm(hi - lo))
    fx = float(np.asarray(intrinsics)[0, 0])
    dist = margin * extent * fx / max(width, 1) + 0.5 * extent
    eye = center + np.array([0.6, 0.6, 0.8]) / np.linalg.norm([0.6, 0.6, 0.8]) * dist
    return look_at_pose(eye, center)


def render_comparison(
    mesh_pred: Mesh,
    mesh_trgt: Mesh,
    intrinsics: np.ndarray,
    pose: np.ndarray,
    height: int,
    width: int,
) -> np.ndarray:
    """Side-by-side target | prediction render (the logger image layout)."""
    rgb_t, _ = render_mesh(mesh_trgt, intrinsics, pose, height, width)
    rgb_p, _ = render_mesh(mesh_pred, intrinsics, pose, height, width)
    return np.concatenate([rgb_t, rgb_p], axis=1)
