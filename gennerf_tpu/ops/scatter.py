"""Segment reductions (the torch_scatter replacement).

The reference leans on torch_scatter's CUDA kernels
(src/models/components/pointnet.py:6,65-67,82,97,113-115) for
point -> plane-cell pooling. On TPU these become batched segment reductions
with a *static* segment count (reso² cells), which XLA lowers to efficient
sorted scatters — fast enough that no hand-written kernel is warranted at
the model's point counts (B·T·512 points into 128² cells).

Conventions match torch_scatter where observable by the models:
  * `scatter_mean` with a zero-initialized output -> empty cells are 0.
  * `scatter_max` gathered back at contributing indices -> empty cells are
    never read, so the -inf identity is masked to 0 for safety.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(values: jnp.ndarray, index: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Batched segment sum. ACCUMULATES IN f32 and returns the input dtype:
    summing hundreds/thousands of bf16 contributions per plane cell in bf16
    loses ~8 bits per doubling of the segment population — under bf16-mixed
    this is the pointnet triplane's whole information channel. f32 inputs
    are bit-unchanged.

    Args:
        values: (B, N, C).
        index: (B, N) int segment ids in [0, num_segments).

    Returns:
        (B, num_segments, C).
    """
    acc = jax.vmap(
        lambda v, i: jax.ops.segment_sum(v.astype(jnp.float32), i, num_segments)
    )(values, index)
    return acc.astype(values.dtype)


def segment_count(index: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """(B, N) -> (B, num_segments) occupancy counts."""
    ones = jnp.ones(index.shape + (1,), dtype=jnp.float32)
    return segment_sum(ones, index, num_segments)[..., 0]


def segment_mean(values: jnp.ndarray, index: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Batched segment mean; empty segments are 0 (torch_scatter
    `scatter_mean(out=zeros)` semantics)."""
    total = segment_sum(values, index, num_segments)
    count = segment_count(index, num_segments)
    return total / jnp.maximum(count, 1.0)[..., None]


def segment_max(values: jnp.ndarray, index: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Batched segment max; empty segments are 0 (never read by callers that
    gather back at contributing indices)."""
    out = jax.vmap(lambda v, i: jax.ops.segment_max(v, i, num_segments))(values, index)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def scatter_to_plane(
    features: jnp.ndarray,
    index: jnp.ndarray,
    reso: int,
    reduce: str = "mean",
) -> jnp.ndarray:
    """Scatter per-point features onto a reso×reso plane.

    Equivalent of the reference `generate_plane_features` scatter
    (pointnet.py:72-90): flat cell index = x0 + reso*x1, reshaped so that the
    row axis is x1 and the column axis x0.

    Args:
        features: (B, N, C).
        index: (B, N) flat plane-cell indices from `coordinate2index`.

    Returns:
        (B, C, reso, reso).
    """
    if reduce == "mean":
        plane = segment_mean(features, index, reso * reso)
    elif reduce == "max":
        plane = segment_max(features, index, reso * reso)
    elif reduce == "sum":
        plane = segment_sum(features, index, reso * reso)
    else:
        raise ValueError(reduce)
    B, _, C = features.shape
    return plane.reshape(B, reso, reso, C).transpose(0, 3, 1, 2)


def pool_and_gather(
    features: jnp.ndarray,
    index: jnp.ndarray,
    num_segments: int,
    reduce: str = "max",
) -> jnp.ndarray:
    """Local pooling: reduce per segment, then gather back to the points.

    Equivalent of the reference `pool_local` (pointnet.py:105-121).

    Args:
        features: (B, N, C).
        index: (B, N).

    Returns:
        (B, N, C) — each point carries its cell's pooled feature.
    """
    if reduce == "max":
        pooled = segment_max(features, index, num_segments)
    elif reduce == "mean":
        pooled = segment_mean(features, index, num_segments)
    else:
        raise ValueError(reduce)
    return jnp.take_along_axis(pooled, index[..., None], axis=1)
