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

    # neighbor-pair selection as a one-hot masked sum over the 8-way axis
    # instead of take_along_axis: a per-pixel dynamic gather over H*W
    # elements lowers to scalar address math on TPU, while 8 selects + a
    # sum stay fully vectorized on the VPU. Bit-exact with the gather:
    # when diff[best] is finite the selected slot is NaN-free (any NaN in
    # the pair makes its norm NaN -> diff inf), so the masked sum IS the
    # selected value; when every direction is invalid (all-inf diff) the
    # gather version produced NaN through a NaN operand — restored below.
    onehot = best[None] == jnp.arange(8)[:, None, None]  # (8, H, W)
    z2 = jnp.where(jnp.isnan(p2), 0.0, p2)
    z3 = jnp.where(jnp.isnan(p3), 0.0, p3)
    sel2 = jnp.sum(jnp.where(onehot[..., None], z2, 0.0), axis=0)  # (H, W, 3)
    sel3 = jnp.sum(jnp.where(onehot[..., None], z3, 0.0), axis=0)
    normals = jnp.cross(sel2 - anchor, sel3 - anchor)
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
    # all-inf diff covers the anchor-NaN case too (a NaN anchor NaNs every
    # pairwise norm, so every direction reads inf)
    undefined = jnp.isinf(diff.min(axis=0))
    return jnp.where(undefined[..., None], jnp.nan, normals)
