"""Point-sampling ops: pixel sampling, ray/frustum samplers, FPS, iSDF bounds.

TPU-first re-design of src/models/utils.py:178-202 (`farthest_point_sample`),
:332-393 (pixel samplers), :415-540 (frustum/ray samplers), :581-634
(`bounds_pc_batch`). The reference's data-dependent `argwhere`+`randperm`
valid-pixel sampling becomes a fixed-shape masked top-k over random scores —
identical distribution (a uniform random permutation of the valid set),
static shapes for XLA.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# pixel sampling
# ---------------------------------------------------------------------------

def sample_pixels(key, B: int, H: int, W: int, num_samples: int):
    """Uniform pixel sampling (reference `sample_pixels`, utils.py:332-337)."""
    kh, kw = jax.random.split(key)
    h_idxs = jax.random.randint(kh, (B, num_samples), 0, H)
    w_idxs = jax.random.randint(kw, (B, num_samples), 0, W)
    b_idxs = jnp.arange(B)[:, None]
    return b_idxs, h_idxs, w_idxs


def sample_valid_pixels_masked(key, valid: jnp.ndarray, num_samples: int):
    """Sample `num_samples` pixels uniformly at random from the valid set.

    Fixed-shape equivalent of reference `sample_valid_depth_pixels` /
    `sample_valid_pixels` (utils.py:340-393): random scores on valid pixels,
    -inf elsewhere, take top-k. Equivalent to sampling without replacement
    uniformly among valid pixels.

    If a row has fewer than `num_samples` valid pixels the remainder are
    filled from invalid pixels (the reference raised instead; here the
    caller can detect it via the returned `ok` mask).

    Args:
        valid: (B, H, W) bool.

    Returns:
        b_idxs (B, 1), h_idxs (B, num_samples), w_idxs (B, num_samples),
        ok (B, num_samples) bool — whether each sample hit a valid pixel.
    """
    B, H, W = valid.shape
    scores = jax.random.uniform(key, (B, H * W))
    scores = jnp.where(valid.reshape(B, H * W), scores, -jnp.inf)
    _, flat_idx = jax.lax.top_k(scores, num_samples)  # (B, num_samples)
    h_idxs = flat_idx // W
    w_idxs = flat_idx % W
    ok = jnp.take_along_axis(valid.reshape(B, H * W), flat_idx, axis=1)
    b_idxs = jnp.arange(B)[:, None]
    return b_idxs, h_idxs, w_idxs, ok


def sample_valid_depth_pixels(key, depth: jnp.ndarray, num_samples: int):
    """Sample pixels with nonzero depth (reference utils.py:340-363)."""
    return sample_valid_pixels_masked(key, depth != 0, num_samples)


def sample_valid_pixels(key, depth: jnp.ndarray, normals: jnp.ndarray, num_samples: int):
    """Sample pixels with nonzero depth and finite normals (utils.py:366-393).

    Args:
        normals: (B, H, W, 3) — NaN where the normal is undefined.
    """
    valid = (depth != 0) & ~jnp.isnan(normals).any(axis=-1)
    return sample_valid_pixels_masked(key, valid, num_samples)


# ---------------------------------------------------------------------------
# frustum / ray samplers
# ---------------------------------------------------------------------------

def _pixels_to_camera_dirs(h_idxs, w_idxs, intrinsics):
    """Normalized image coords: ((u-cx)/fx, (v-cy)/fy)."""
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    w_norm = (w_idxs - cx) / fx
    h_norm = (h_idxs - cy) / fy
    return h_norm, w_norm


def _camera_to_world(xyz_camera: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 3) camera-space points through (B, 4, 4) camera->world pose."""
    ones = jnp.ones_like(xyz_camera[..., :1])
    h = jnp.concatenate([xyz_camera, ones], axis=-1)  # (B, N, 4)
    world_h = jnp.einsum("bij,bnj->bni", pose, h, precision=jax.lax.Precision.HIGHEST)
    return world_h[..., :3] / world_h[..., 3:4]


def sample_points_in_frustum(key, h_idxs, w_idxs, intrinsics, pose, min_dist, max_dist):
    """Uniform-in-volume frustum samples (reference utils.py:415-455).

    Depth sampled as sqrt(U)·(max-min)+min so density is uniform in the
    (2D-slice-area-weighted) frustum volume.

    Returns:
        xyz_world (B, N, 3), z (B, N).
    """
    B, num_samples = h_idxs.shape
    u = jax.random.uniform(key, (B, num_samples))
    z = jnp.sqrt(u) * (max_dist - min_dist) + min_dist
    h_norm, w_norm = _pixels_to_camera_dirs(h_idxs.astype(z.dtype), w_idxs.astype(z.dtype), intrinsics)
    xyz_camera = jnp.stack([w_norm * z, h_norm * z, z], axis=-1)
    return _camera_to_world(xyz_camera, pose), z


def sample_points_on_rays(
    key,
    h_idxs,
    w_idxs,
    depths,
    intrinsics,
    poses,
    N: int,
    M: int,
    delta: float,
    min_dist: float,
    sigma: float,
):
    """iSDF-style ray sampling (reference utils.py:458-540; arXiv:2204.02296).

    Per sampled pixel with surface depth D:
      1 sample at D, N stratified samples linspace(min_dist, D+delta, N),
      M Gaussian samples N(D, sigma).

    Args:
        depths: (B, n_rays) surface depth of each sampled pixel.

    Returns:
        xyz_world (B, n_rays, 1+N+M, 3), z (B, n_rays, 1+N+M).
    """
    B, n_rays = depths.shape
    strat = jnp.linspace(
        jnp.full_like(depths, min_dist), depths + delta, N, axis=-1
    )  # (B, n_rays, N)
    gauss = depths[..., None] + sigma * jax.random.normal(key, (B, n_rays, M), dtype=depths.dtype)
    z = jnp.concatenate([depths[..., None], strat, gauss], axis=-1)  # (B, n_rays, 1+N+M)

    h_norm, w_norm = _pixels_to_camera_dirs(h_idxs.astype(z.dtype), w_idxs.astype(z.dtype), intrinsics)
    x = w_norm[..., None] * z
    y = h_norm[..., None] * z
    xyz_camera = jnp.stack([x, y, z], axis=-1).reshape(B, n_rays * (1 + N + M), 3)
    xyz_world = _camera_to_world(xyz_camera, poses).reshape(B, n_rays, 1 + N + M, 3)
    return xyz_world, z


def sample_points_from_bounding_box(key, xyz: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """Uniform samples inside each cloud's AABB (reference utils.py:396-412)."""
    lo = xyz.min(axis=1, keepdims=True)
    hi = xyz.max(axis=1, keepdims=True)
    u = jax.random.uniform(key, (xyz.shape[0], num_samples, 3), dtype=xyz.dtype)
    return lo + u * (hi - lo)


# ---------------------------------------------------------------------------
# farthest point sampling
# ---------------------------------------------------------------------------

def farthest_point_sample(key, xyz: jnp.ndarray, npoint: int,
                          use_pallas: "bool | None" = None):
    """Farthest-point sampling (reference utils.py:178-202).

    Inherently sequential (npoint iterations). On TPU with a
    layout-compatible shape the WHOLE loop runs inside one Pallas kernel
    (ops/pallas/fps.py — 2.6x the XLA fori_loop at flagship shapes,
    bit-identical indices); otherwise a `lax.fori_loop` of fused distance
    reductions. Invalid points can be excluded by passing them as
    duplicates (distance 0 keeps them unselected once any valid point is
    in).

    Args:
        xyz: (B, N, 3).
        npoint: static number of samples.
        use_pallas: force (True/False) or auto-select (None).

    Returns:
        sampled_xyz (B, npoint, 3), centroids (B, npoint) int32 indices.
    """
    B, N, _ = xyz.shape
    if use_pallas is None:
        import os

        from .pallas.fps import fps_pallas_supported

        # escape hatch for shape-specific Mosaic toolchain failures (the
        # B=4 remote-compile bisect, BENCH.md batch-scaling notes): forces
        # the bit-identical XLA fori_loop path without a config change
        if os.environ.get("GENNERF_FPS_PALLAS", "").lower() in ("0", "false"):
            use_pallas = False
        else:
            use_pallas = (
                jax.devices()[0].platform == "tpu"
                and fps_pallas_supported(B, N, npoint)
            )
    if use_pallas:
        from .pallas.fps import fps_pallas

        return fps_pallas(key, xyz, npoint)
    farthest0 = jax.random.randint(key, (B,), 0, N)
    # distances in float32 regardless of xyz.dtype — fps_pallas force-casts
    # to f32, so the XLA branch must too or shape-based tier dispatch could
    # silently change which centroids are selected for non-f32 inputs
    xyz32 = xyz.astype(jnp.float32)

    def body(i, carry):
        distance, farthest, centroids = carry
        centroids = centroids.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz32, farthest[:, None, None], axis=1)  # (B, 1, 3)
        dist = jnp.sum((xyz32 - centroid) ** 2, axis=-1)  # (B, N)
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, axis=-1)
        return distance, farthest, centroids

    init = (
        jnp.full((B, N), 1e10, dtype=jnp.float32),
        farthest0,
        jnp.zeros((B, npoint), dtype=jnp.int32),
    )
    _, _, centroids = jax.lax.fori_loop(0, npoint, body, init)
    sampled = jnp.take_along_axis(xyz, centroids[..., None].astype(jnp.int32), axis=1)
    return sampled, centroids


def voxel_hash_downsample(key, xyz: jnp.ndarray, npoint: int):
    """Voxel-hash sparsification: one random representative per occupied
    cell of an AABB-fitted grid, padded to `npoint` with uniform resamples.

    Fully parallel alternative to `farthest_point_sample` (SURVEY §7: the
    FPS fori_loop is npoint sequential steps and dominates the training
    step's latency on TPU); selected via `pointnet.sparsifier='voxel_hash'`.
    Coverage is FPS-like (spread over the cloud) but the exact point set is
    a distribution delta vs the reference's FPS — documented, opt-in.

    Args:
        xyz: (B, N, 3).
        npoint: static output count.

    Returns:
        sampled_xyz (B, npoint, 3), indices (B, npoint) int32.
    """
    B, N, _ = xyz.shape
    # grid sized so occupied cells comfortably exceed npoint on real scenes
    res = max(int(np.ceil(npoint ** (1.0 / 3.0) * 2.0)), 2)
    lo = xyz.min(axis=1, keepdims=True)
    hi = xyz.max(axis=1, keepdims=True)
    cell = jnp.clip(((xyz - lo) / jnp.maximum(hi - lo, 1e-6) * res), 0, res - 1).astype(jnp.int32)
    ids = (cell[..., 0] * res + cell[..., 1]) * res + cell[..., 2]  # (B, N)

    # sort by (cell, random) so each cell's representative is random; then
    # first-in-cell flags become the selection scores
    rnd = jax.random.uniform(key, (B, N))
    order = jnp.argsort(ids.astype(jnp.float32) + rnd * 0.5, axis=1)
    ids_sorted = jnp.take_along_axis(ids, order, axis=1)
    first = jnp.concatenate(
        [jnp.ones((B, 1), bool), ids_sorted[:, 1:] != ids_sorted[:, :-1]], axis=1
    )
    # rank occupied-cell representatives first, random backfill after
    score = first.astype(jnp.float32) + rnd * 1e-3
    _, top = jax.lax.top_k(score, npoint)  # (B, npoint) positions in sorted order
    idx = jnp.take_along_axis(order, top, axis=1).astype(jnp.int32)
    return jnp.take_along_axis(xyz, idx[..., None], axis=1), idx


# ---------------------------------------------------------------------------
# iSDF bounds + gradient supervision targets
# ---------------------------------------------------------------------------

def bounds_pc_batch(pc: jnp.ndarray, z_vals: jnp.ndarray, depth_sample: jnp.ndarray, do_grad: bool = True):
    """Signed distance bounds to the sampled surface set (iSDF loss.py port;
    reference utils.py:581-634).

    Args:
        pc: (B, n_rays, 1+N+M, 3) ray samples; [:, :, 0] are surface points.
        z_vals: (B, n_rays, 1+N+M) depths of the samples.
        depth_sample: (B, n_rays) surface depth per ray.

    Returns:
        bounds (B, n_rays, 1+N+M): distance to the nearest surface point,
            negated behind the surface.
        grad (B, n_rays, N+M, 3) or None: unit vectors pointing from the
            chosen surface point TO the sample (negated behind the
            surface). Callers wanting the toward-surface/normal-aligned
            direction negate the result, as train/step.py does —
            reference parity: model.py:671 flips with `-grad_vec`. NaN
            where a sample coincides with its nearest surface point.
    """
    surf_pc = pc[:, :, 0]  # (B, R, 3)
    diff = pc[:, :, :, None, :] - surf_pc[:, None, None, :, :]  # (B, R, S, R, 3)
    dists = jnp.linalg.norm(diff, axis=-1)  # (B, R, S, R)
    min_dists = dists.min(axis=-1)
    closest = dists.argmin(axis=-1)  # (B, R, S)
    behind = z_vals > depth_sample[:, :, None]
    bounds = jnp.where(behind, -min_dists, min_dists)

    grad = None
    if do_grad:
        grad = jnp.take_along_axis(diff, closest[..., None, None], axis=3)[..., 0, :]  # (B,R,S,3)
        grad = grad[:, :, 1:]  # exclude the surface sample
        grad = grad / jnp.linalg.norm(grad, axis=-1, keepdims=True)
        grad = jnp.where(behind[:, :, 1:, None], -grad, grad)
    return bounds, grad
