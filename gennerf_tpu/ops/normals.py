"""Point-cloud normal estimation from an organized depth point map.

Reference: src/models/utils.py:1297-1352 (`estimate_pointcloud_normals`,
itself adapted from morefusion). For each pixel, pick the pair of
neighboring directions (offset d=2, 45° apart) whose points are closest to
the anchor, and take the cross product.
"""
from __future__ import annotations

import jax.numpy as jnp

_LOOKUPS = (  # (dy, dx) offsets of the 8 surrounding directions
    (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1),
)


def estimate_pointcloud_normals(points: jnp.ndarray, d: int = 2) -> jnp.ndarray:
    """Estimate per-pixel normals of an organized point map.

    Args:
        points: (H, W, 3) world/camera points laid out on the pixel grid
            (from `get_3d_points`). Invalid points should be NaN or will be
            treated by distance (they pad to NaN at borders).

    Returns:
        (H, W, 3) unit normals; NaN where undefined.
    """
    H, W, _ = points.shape
    padded = jnp.pad(
        points,
        ((d, d), (d, d), (0, 0)),
        mode="constant",
        constant_values=jnp.nan,
    )
    anchor = padded[d : d + H, d : d + W]  # == points

    def shifted(k: int) -> jnp.ndarray:
        dy, dx = _LOOKUPS[k]
        return padded[d + dy * d : d + dy * d + H, d + dx * d : d + dx * d + W]

    p2 = jnp.stack([shifted(k) for k in range(8)])  # (8, H, W, 3)
    p3 = jnp.stack([shifted((k + 2) % 8) for k in range(8)])

    diff = jnp.linalg.norm(p2 - anchor[None], axis=-1) + jnp.linalg.norm(
        p3 - anchor[None], axis=-1
    )  # (8, H, W)
    diff = jnp.where(jnp.isnan(diff), jnp.inf, diff)
    best = jnp.argmin(diff, axis=0)  # (H, W)

    sel2 = jnp.take_along_axis(p2, best[None, :, :, None], axis=0)[0]  # (H, W, 3)
    sel3 = jnp.take_along_axis(p3, best[None, :, :, None], axis=0)[0]
    normals = jnp.cross(sel2 - anchor, sel3 - anchor)
    return normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
