"""Local-pooling PointNet triplane encoder (ConvONet-derived).

Reference: src/models/components/pointnet.py:13-189. Per-point MLP with
ResNet FC blocks interleaved with local scatter-pooling over plane cells;
final features scattered (mean) onto reso² triplanes, optionally smoothed by
a 2D U-Net per plane.

TPU re-design: torch_scatter kernels become static-segment-count segment
reductions (ops/scatter.py) — XLA lowers these to efficient sorted scatters;
every matmul is a clean (N, C) x (C, C') MXU tile.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.coords import coordinate2index, normalize_3d_coordinate, normalize_coordinate
from ..ops.scatter import pool_and_gather, scatter_to_plane, segment_mean
from .common import he_normal, zeros_init
from .resnetfc import ResnetBlockFC
from .unet import UNet


class LocalPoolPointnet(nn.Module):
    """Encode (B, N, 3) point clouds into triplane feature maps.

    Attributes mirror the reference config surface
    (configs/model/gen_nerf.yaml:52-68).
    """

    c_dim: int = 128
    dim: int = 3
    hidden_dim: int = 128
    scatter_type: str = "max"  # local pooling reduce: 'max' | 'mean'
    use_unet: bool = False
    unet_depth: int = 5
    unet_merge_mode: str = "concat"
    unet_start_filts: int = 32
    plane_resolution: int = 128
    grid_resolution: int = 32
    plane_type: Sequence[str] = ("xz", "xy", "yz")
    padding: float = 0.1
    n_blocks: int = 5
    use_unet3d: bool = False
    unet3d_f_maps: int = 32
    unet3d_num_levels: int = 3
    # compute dtype (bf16-mixed training); params stay f32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, p: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """
        Args:
            p: (B, N, 3) world points (roughly within the padded unit cube).

        Returns:
            dict plane -> (B, c_dim, reso, reso).
        """
        reso = self.plane_resolution
        grid_reso = self.grid_resolution

        index = {}
        num_cells = {}
        for plane in self.plane_type:
            if plane == "grid":
                coord = normalize_3d_coordinate(p, padding=self.padding)
                index[plane] = coordinate2index(coord, grid_reso, coord_type="3d")
                num_cells[plane] = grid_reso**3
            else:
                coord = normalize_coordinate(p, padding=self.padding, plane=plane)
                index[plane] = coordinate2index(coord, reso)  # (B, N)
                num_cells[plane] = reso * reso

        net = nn.Dense(2 * self.hidden_dim, dtype=self.dtype, name="fc_pos")(p)
        net = ResnetBlockFC(size_out=self.hidden_dim, dtype=self.dtype, name="block_0")(net)
        for i in range(1, self.n_blocks):
            pooled = 0
            for plane in self.plane_type:
                pooled += pool_and_gather(net, index[plane], num_cells[plane], self.scatter_type)
            net = jnp.concatenate([net, pooled], axis=-1)
            net = ResnetBlockFC(size_out=self.hidden_dim, dtype=self.dtype, name=f"block_{i}")(net)

        c = nn.Dense(self.c_dim, dtype=self.dtype, name="fc_c")(net)  # (B, N, c_dim)

        unet = (
            UNet(
                self.c_dim,
                depth=self.unet_depth,
                start_filts=self.unet_start_filts,
                merge_mode=self.unet_merge_mode,
                dtype=self.dtype,
                name="unet",
            )
            if self.use_unet
            else None
        )  # one UNet shared across the three planes (reference pointnet.py:50)

        unet3d = None
        if self.use_unet3d and "grid" in self.plane_type:
            from .unet3d import UNet3D

            unet3d = UNet3D(self.c_dim, f_maps=self.unet3d_f_maps,
                            num_levels=self.unet3d_num_levels, name="unet3d")

        fea = {}
        flat_planes = [pl for pl in self.plane_type if pl != "grid"]
        if "grid" in self.plane_type:
            g = segment_mean(c, index["grid"], grid_reso**3)  # (B, r^3, C)
            B = p.shape[0]
            # flat index = x0 + r*(x1 + r*x2) -> reshape (z-major) then
            # transpose to (B, C, x, y, z)
            vol = g.reshape(B, grid_reso, grid_reso, grid_reso, self.c_dim)
            vol = vol.transpose(0, 4, 3, 2, 1)  # (B, C, x0, x1, x2)
            if unet3d is not None:
                vol = unet3d(vol)
            fea["grid"] = vol
        if flat_planes:
            scattered = [
                scatter_to_plane(c, index[pl], reso, reduce="mean")
                for pl in flat_planes
            ]
            if unet is not None:
                # ONE batched U-Net pass over all planes (the weights are
                # shared, reference pointnet.py:50; a (3B, C, r, r) batch
                # tiles the convs onto the MXU far better than 3x B=1)
                B = p.shape[0]
                stacked = jnp.concatenate(scattered, axis=0)  # (3B, C, r, r)
                smoothed = unet(stacked)
                scattered = [
                    smoothed[i * B : (i + 1) * B] for i in range(len(flat_planes))
                ]
            for pl, f in zip(flat_planes, scattered):
                fea[pl] = f
        return fea


class FeaturePlaneMerger(nn.Module):
    """Merge triplane dicts across successive encode calls
    (reference src/models/components/plane_merger.py)."""

    strategy: str = "average"  # 'average' | 'learn'
    alpha: float = 0.5
    c_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, plane_1: Dict[str, jnp.ndarray], plane_2: Dict[str, jnp.ndarray]
    ) -> Dict[str, jnp.ndarray]:
        if self.strategy == "average":
            return {
                k: self.alpha * plane_1[k] + (1 - self.alpha) * plane_2[k]
                for k in plane_1
            }
        if self.strategy == "learn":
            conv = nn.Conv(self.c_dim, (1, 1), dtype=self.dtype, name="merge_conv")
            out = {}
            for k in plane_1:
                combined = jnp.concatenate([plane_1[k], plane_2[k]], axis=1)
                out[k] = conv(combined.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
            return out
        raise NotImplementedError(f"merge strategy {self.strategy}")
