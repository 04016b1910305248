"""Voxel-grid coordinate helpers.

Reference behavior: src/data/tsdf.py:25-68 (`coordinates`), and
src/models/utils.py:926-945 (`get_grid_coordinates`, `get_corner_coordinates`).
Pure functions over static shapes; everything is jit-safe.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def coordinates(voxel_dim) -> jnp.ndarray:
    """Integer meshgrid of a voxel volume.

    Args:
        voxel_dim: (nx, ny, nz) static ints.

    Returns:
        (3, nx*ny*nz) int32 array of voxel indices, x-major ordering
        (index = x*ny*nz + y*nz + z), matching reference `coordinates`
        (src/data/tsdf.py:25).
    """
    nx, ny, nz = (int(d) for d in voxel_dim)
    x, y, z = jnp.meshgrid(
        jnp.arange(nx, dtype=jnp.int32),
        jnp.arange(ny, dtype=jnp.int32),
        jnp.arange(nz, dtype=jnp.int32),
        indexing="ij",
    )
    return jnp.stack((x.reshape(-1), y.reshape(-1), z.reshape(-1)))


def world_coordinates(voxel_dim, voxel_size: float, origin) -> jnp.ndarray:
    """World-space xyz positions of every voxel center.

    Returns (3, nx*ny*nz) float32: coords * voxel_size + origin.
    """
    origin = jnp.asarray(origin, dtype=jnp.float32).reshape(3, 1)
    return coordinates(voxel_dim).astype(jnp.float32) * voxel_size + origin


def grid_coordinates(nx: int, ny: int, nz: int, volume_size) -> jnp.ndarray:
    """Dense query grid spanning [0, volume_size] per axis (linspace endpoints
    inclusive), as used by the dense TSDF decode
    (reference src/models/utils.py:926-935).

    Returns:
        (nx, ny, nz, 3) float32.
    """
    x = jnp.linspace(0.0, float(volume_size[0]), nx)
    y = jnp.linspace(0.0, float(volume_size[1]), ny)
    z = jnp.linspace(0.0, float(volume_size[2]), nz)
    gx, gy, gz = jnp.meshgrid(x, y, z, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1).astype(jnp.float32)


def corner_coordinates(volume_size) -> np.ndarray:
    """8 corner xyz positions of an axis-aligned volume starting at 0.

    Host-side helper (reference src/models/utils.py:937-945).
    """
    xs = [0.0, float(volume_size[0])]
    ys = [0.0, float(volume_size[1])]
    zs = [0.0, float(volume_size[2])]
    return np.array([[x, y, z] for x in xs for y in ys for z in zs], dtype=np.float32)


def normalize_coordinate(p: jnp.ndarray, padding: float = 0.1, plane: str = "xz") -> jnp.ndarray:
    """Project 3D points onto a canonical plane and normalize to [0, 1).

    ConvONet convention (reference src/models/utils.py:75-98): select the two
    axes of `plane`, divide by (1 + padding + 1e-5), shift by 0.5, clamp into
    [0, 1 - 1e-5].

    Args:
        p: (..., 3) points (expected roughly in [-0.5, 0.5] per axis).
        plane: 'xz' | 'xy' | 'yz'.

    Returns:
        (..., 2) in [0, 1).
    """
    if plane == "xz":
        xy = p[..., (0, 2)]
    elif plane == "xy":
        xy = p[..., (0, 1)]
    elif plane == "yz":
        xy = p[..., (1, 2)]
    else:
        raise ValueError(f"unknown plane {plane!r}")
    xy = xy / (1.0 + padding + 10e-6) + 0.5
    # clamp outliers into the valid cell range (reference clamps with 1-10e-6)
    return jnp.clip(xy, 0.0, 1.0 - 10e-6)


def normalize_3d_coordinate(p: jnp.ndarray, padding: float = 0.1) -> jnp.ndarray:
    """3D variant of `normalize_coordinate` (reference src/models/utils.py:101-117)."""
    p = p / (1.0 + padding + 10e-4) + 0.5
    return jnp.clip(p, 0.0, 1.0 - 10e-4)


def coordinate2index(x: jnp.ndarray, reso: int, coord_type: str = "2d") -> jnp.ndarray:
    """Rasterize normalized coordinates in [0,1) to flat cell indices.

    Reference src/models/utils.py:57-72: `index = x0 + reso * x1` for planes,
    `x0 + reso * (x1 + reso * x2)` for grids.

    Args:
        x: (B, N, 2) or (B, N, 3) normalized coords.
        reso: cells per axis.

    Returns:
        (B, N) int32 flat indices in [0, reso^dim).
    """
    xi = (x * reso).astype(jnp.int32)
    if coord_type == "2d":
        index = xi[..., 0] + reso * xi[..., 1]
    elif coord_type == "3d":
        index = xi[..., 0] + reso * (xi[..., 1] + reso * xi[..., 2])
    else:
        raise ValueError(coord_type)
    return index
