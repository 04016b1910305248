"""PointNet++ set-abstraction encoder.

Reference: src/models/components/pointnetpp.py (an orphan alternative point
encoder, imported nowhere — ported for capability parity). Hierarchical
set abstraction: FPS centroids, ball-query grouping with a fixed sample
count, per-group MLPs, max pooling. All fixed shapes (ball query pads with
the first neighbor, like the reference's group_first trick).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.sampling import farthest_point_sample


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 3), (B, M, 3) -> (B, N, M) squared distances
    (reference pointnetpp.py:159-186)."""
    return (
        jnp.sum(src**2, -1)[..., None]
        + jnp.sum(dst**2, -1)[:, None]
        - 2 * jnp.einsum("bnc,bmc->bnm", src, dst)
    )


def query_ball_point(radius: float, nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray) -> jnp.ndarray:
    """Fixed-size ball query (reference pointnetpp.py:213-240): for each
    centroid take the first `nsample` points within radius; out-of-ball
    slots replicate the first in-ball point."""
    B, S, _ = new_xyz.shape
    dists = square_distance(new_xyz, xyz)  # (B, S, N)
    in_ball = dists <= radius**2
    # rank points: in-ball keep original order, out-of-ball pushed to the end
    N = xyz.shape[1]
    order = jnp.where(in_ball, jnp.arange(N)[None, None], N)
    idx = jnp.argsort(order, axis=-1)[..., :nsample]  # (B, S, nsample)
    # replace out-of-ball picks with the first (closest-ordered) pick
    picked_in = jnp.take_along_axis(order, idx, axis=-1) < N
    first = idx[..., :1]
    return jnp.where(picked_in, idx, first)


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather (B, N, C) at integer index arrays of shape (B, ...)."""
    B = points.shape[0]
    flat = idx.reshape(B, -1)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(*idx.shape, points.shape[-1])


class PointNetSetAbstraction(nn.Module):
    """One SA level (reference pointnetpp.py:11-103)."""

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    group_all: bool = False

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, points: Optional[jnp.ndarray], key: jax.Array):
        """
        Args:
            xyz: (B, N, 3); points: optional (B, N, C) features.

        Returns:
            new_xyz (B, npoint, 3), new_points (B, npoint, mlp[-1]).
        """
        if self.group_all:
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
            grouped = xyz[:, None]  # (B, 1, N, 3)
            if points is not None:
                grouped = jnp.concatenate([grouped, points[:, None]], axis=-1)
        else:
            new_xyz, _ = farthest_point_sample(key, xyz, self.npoint)
            idx = query_ball_point(self.radius, self.nsample, xyz, new_xyz)
            grouped_xyz = index_points(xyz, idx) - new_xyz[:, :, None]
            grouped = grouped_xyz
            if points is not None:
                grouped = jnp.concatenate([grouped, index_points(points, idx)], axis=-1)

        h = grouped
        for i, width in enumerate(self.mlp):
            h = nn.Dense(width, name=f"mlp_{i}")(h)
            h = nn.relu(h)
        new_points = h.max(axis=2)  # max over the group axis
        return new_xyz, new_points


class PointNetPlusPlus(nn.Module):
    """3-level SA encoder producing a global feature
    (reference pointnetpp.py:106-157)."""

    feature_dim: int = 256

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        k1, k2 = jax.random.split(key)
        l1_xyz, l1_pts = PointNetSetAbstraction(
            npoint=128, radius=0.2, nsample=32, mlp=(64, 64, 128), name="sa1"
        )(xyz, None, k1)
        l2_xyz, l2_pts = PointNetSetAbstraction(
            npoint=32, radius=0.4, nsample=32, mlp=(128, 128, 256), name="sa2"
        )(l1_xyz, l1_pts, k2)
        _, l3_pts = PointNetSetAbstraction(
            npoint=1, radius=1.0, nsample=1, mlp=(256, 256, self.feature_dim),
            group_all=True, name="sa3",
        )(l2_xyz, l2_pts, k2)
        return l3_pts[:, 0]  # (B, feature_dim)
