"""Bilinear / trilinear grid sampling.

The decoder's hot gather path. Pure-JAX formulation (gather + lerp) is
differentiable to arbitrary order via `jax.grad` — the reference needed
hand-written double-backward-safe replacements (src/models/utils.py:1117-1293
`grid_sample_2d/3d`) because cuDNN grid_sample lacks a second derivative;
here the straightforward implementation is the robust one.

Conventions follow torch.nn.functional.grid_sample(padding_mode='border',
align_corners=True): normalized coords in [-1, 1], coordinate k of the grid
indexes the (last-k) spatial axis of the input.

The TPU hot path fuses these gathers with the decoder MLP in
ops/pallas/fused_decoder.py; these XLA versions are the reference
implementation and the CPU/test fallback.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool = True) -> jnp.ndarray:
    """[-1, 1] -> pixel index space (torch grid_sample conventions)."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample_2d(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    align_corners: bool = True,
) -> jnp.ndarray:
    """2D grid sample, border padding, align_corners=True.

    Args:
        image: (B, C, IH, IW).
        grid:  (B, H, W, 2) with grid[..., 0]=x indexing IW, [..., 1]=y -> IH.

    Returns:
        (B, C, H, W).
    """
    B, C, IH, IW = image.shape
    _, H, W, _ = grid.shape
    ix = _unnormalize(grid[..., 0], IW, align_corners)
    iy = _unnormalize(grid[..., 1], IH, align_corners)

    # channels-last gather; measured on v5e: take_along_axis with the index
    # broadcast over C outperforms explicit (1, C)-row-slice gathers
    # (vmap+jnp.take) by ~5x in the fused decode program
    flat = image.transpose(0, 2, 3, 1).reshape(B, IH * IW, C)

    def gather(yi, xi):
        yi = jnp.clip(yi, 0, IH - 1)
        xi = jnp.clip(xi, 0, IW - 1)
        idx = (yi * IW + xi).reshape(B, H * W, 1)
        vals = jnp.take_along_axis(flat, idx, axis=1)  # (B, H*W, C)
        return vals.reshape(B, H, W, C).transpose(0, 3, 1, 2)

    if mode == "nearest":
        return gather(jnp.round(iy).astype(jnp.int32), jnp.round(ix).astype(jnp.int32))

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    wx = (ix - x0)[:, None]  # (B, 1, H, W)
    wy = (iy - y0)[:, None]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def grid_sample_3d(
    volume: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    align_corners: bool = True,
    padding_mode: str = "border",
) -> jnp.ndarray:
    """3D grid sample, align_corners=True, border or zeros padding.

    Args:
        volume: (B, C, ID, IH, IW).
        grid:   (B, N, 3) with grid[..., 0]=x -> IW, [..., 1]=y -> IH,
                [..., 2]=z -> ID  (torch 5D grid_sample convention, with the
                two singleton spatial dims of the reference call already
                squeezed away).

    Returns:
        (B, C, N).
    """
    B, C, ID, IH, IW = volume.shape
    _, N, _ = grid.shape
    ix = _unnormalize(grid[..., 0], IW, align_corners)
    iy = _unnormalize(grid[..., 1], IH, align_corners)
    iz = _unnormalize(grid[..., 2], ID, align_corners)

    # channels-last row gather (contiguous C-vector per tap; see the 2D note)
    flat = volume.transpose(0, 2, 3, 4, 1).reshape(B, ID * IH * IW, C)
    zeros_pad = padding_mode == "zeros"

    def gather(zi, yi, xi):
        if zeros_pad:
            inb = (
                (zi >= 0) & (zi < ID) & (yi >= 0) & (yi < IH) & (xi >= 0) & (xi < IW)
            )[..., None]  # (B, N, 1)
        zi = jnp.clip(zi, 0, ID - 1)
        yi = jnp.clip(yi, 0, IH - 1)
        xi = jnp.clip(xi, 0, IW - 1)
        idx = ((zi * IH + yi) * IW + xi).reshape(B, N, 1)
        vals = jnp.take_along_axis(flat, idx, axis=1)  # (B, N, C)
        if zeros_pad:
            vals = jnp.where(inb, vals, 0.0)
        return vals.transpose(0, 2, 1)  # (B, C, N)

    if mode == "nearest":
        return gather(
            jnp.round(iz).astype(jnp.int32),
            jnp.round(iy).astype(jnp.int32),
            jnp.round(ix).astype(jnp.int32),
        )

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    z0 = jnp.floor(iz)
    x0i, y0i, z0i = x0.astype(jnp.int32), y0.astype(jnp.int32), z0.astype(jnp.int32)
    wx = (ix - x0)[:, None]  # (B, 1, N)
    wy = (iy - y0)[:, None]
    wz = (iz - z0)[:, None]

    c000 = gather(z0i, y0i, x0i)
    c001 = gather(z0i, y0i, x0i + 1)
    c010 = gather(z0i, y0i + 1, x0i)
    c011 = gather(z0i, y0i + 1, x0i + 1)
    c100 = gather(z0i + 1, y0i, x0i)
    c101 = gather(z0i + 1, y0i, x0i + 1)
    c110 = gather(z0i + 1, y0i + 1, x0i)
    c111 = gather(z0i + 1, y0i + 1, x0i + 1)

    c00 = c000 * (1 - wx) + c001 * wx
    c01 = c010 * (1 - wx) + c011 * wx
    c10 = c100 * (1 - wx) + c101 * wx
    c11 = c110 * (1 - wx) + c111 * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz


def trilinear_interpolation(
    voxel_volume: jnp.ndarray,
    xyz: jnp.ndarray,
    origin: jnp.ndarray,
    voxel_size: float,
    mode: str = "bilinear",
) -> jnp.ndarray:
    """Sample a channels-last voxel volume at world-space points.

    Parity with reference `trilinear_interpolation` (src/models/utils.py:999-
    1042): world points are normalized by the volume extent
    (dim * voxel_size) into [-1, 1] and sampled with border padding and
    align_corners=True.

    Args:
        voxel_volume: (B, nx, ny, nz, C) — channels last, the natural TPU
            layout (last dim rides the 128-lane axis).
        xyz: (B, N, 3) world points.
        origin: (3,) world position of voxel (0, 0, 0).
        voxel_size: metric voxel size.

    Returns:
        (B, N, C) interpolated features.
    """
    B, nx, ny, nz, C = voxel_volume.shape
    origin = jnp.asarray(origin).reshape(-1)[:3]
    extent = jnp.array([nx, ny, nz], dtype=xyz.dtype) * voxel_size
    norm = 2.0 * (xyz - origin) / extent - 1.0  # (B, N, 3) in [-1, 1]

    # reference permutes (B,nx,ny,nz,C)->(B,C,nz,ny,nx) so that grid x indexes
    # nx; we keep channels-last and unnormalize per-axis directly.
    ix = _unnormalize(norm[..., 0], nx)
    iy = _unnormalize(norm[..., 1], ny)
    iz = _unnormalize(norm[..., 2], nz)

    N = xyz.shape[1]
    flat = voxel_volume.reshape(B, nx * ny * nz, C)

    def gather(xi, yi, zi):
        xi = jnp.clip(xi, 0, nx - 1)
        yi = jnp.clip(yi, 0, ny - 1)
        zi = jnp.clip(zi, 0, nz - 1)
        idx = ((xi * ny + yi) * nz + zi).reshape(B, N, 1)
        return jnp.take_along_axis(flat, idx, axis=1)  # (B, N, C)

    if mode == "nearest":
        return gather(
            jnp.round(ix).astype(jnp.int32),
            jnp.round(iy).astype(jnp.int32),
            jnp.round(iz).astype(jnp.int32),
        )

    x0, y0, z0 = jnp.floor(ix), jnp.floor(iy), jnp.floor(iz)
    x0i, y0i, z0i = x0.astype(jnp.int32), y0.astype(jnp.int32), z0.astype(jnp.int32)
    wx = (ix - x0)[..., None]  # (B, N, 1)
    wy = (iy - y0)[..., None]
    wz = (iz - z0)[..., None]

    c000 = gather(x0i, y0i, z0i)
    c001 = gather(x0i, y0i, z0i + 1)
    c010 = gather(x0i, y0i + 1, z0i)
    c011 = gather(x0i, y0i + 1, z0i + 1)
    c100 = gather(x0i + 1, y0i, z0i)
    c101 = gather(x0i + 1, y0i, z0i + 1)
    c110 = gather(x0i + 1, y0i + 1, z0i)
    c111 = gather(x0i + 1, y0i + 1, z0i + 1)

    c00 = c000 * (1 - wz) + c001 * wz
    c01 = c010 * (1 - wz) + c011 * wz
    c10 = c100 * (1 - wz) + c101 * wz
    c11 = c110 * (1 - wz) + c111 * wz
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wx) + c1 * wx


def sample_plane_feature(
    planes: jnp.ndarray,
    p_norm: jnp.ndarray,
    mode: str = "bilinear",
) -> jnp.ndarray:
    """Bilinearly sample triplane features at normalized plane coords.

    Equivalent of the reference's `GenNerf.sample_plane_feature`
    (src/models/model.py:153-161) minus the coordinate normalization (done by
    the caller via `normalize_coordinate`).

    Args:
        planes: (B, C, reso, reso) feature plane; row index is the second
            normalized coordinate (x1), column index the first (x0), matching
            `coordinate2index`'s `x0 + reso * x1` rasterization.
        p_norm: (B, N, 2) coords in [0, 1).

    Returns:
        (B, N, C).
    """
    vgrid = 2.0 * p_norm - 1.0  # (B, N, 2): [...,0]=x0 -> width, [...,1]=x1 -> height
    out = grid_sample_2d(planes, vgrid[:, :, None, :], mode=mode)  # (B, C, N, 1)
    return out[..., 0].transpose(0, 2, 1)
