"""3D U-Net for volumetric feature-grid smoothing.

Reference: src/models/components/unet3d.py (pytorch-3dunet) — in the
reference only reachable through LocalPoolPointnet's disabled 'grid' path
(pointnet.py:54-57,182-183). Ported compactly: double-conv (+GroupNorm+ReLU)
levels, max-pool downs, nearest-upsample + concat ups. Channels-last
internally (TPU layout), channels-first API.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class _DoubleConv3d(nn.Module):
    out_channels: int
    num_groups: int = 8

    @nn.compact
    def __call__(self, x):  # (B, X, Y, Z, C)
        for i in range(2):
            x = nn.Conv(self.out_channels, (3, 3, 3), padding=1, use_bias=False)(x)
            groups = min(self.num_groups, x.shape[-1])
            while x.shape[-1] % groups != 0:
                groups -= 1
            x = nn.GroupNorm(num_groups=groups)(x)
            x = nn.relu(x)
        return x


class UNet3D(nn.Module):
    """3D U-Net; `f_maps` doubles per level like the reference default."""

    out_channels: int
    f_maps: int = 32
    num_levels: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, C, X, Y, Z) -> (B, out_channels, X, Y, Z)."""
        x = x.transpose(0, 2, 3, 4, 1)
        skips = []
        for level in range(self.num_levels):
            x = _DoubleConv3d(self.f_maps * 2**level, name=f"enc_{level}")(x)
            if level < self.num_levels - 1:
                skips.append(x)
                x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        for level in reversed(range(self.num_levels - 1)):
            skip = skips[level]
            x = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, 1), 2, 2), 2, 3)
            x = x[:, : skip.shape[1], : skip.shape[2], : skip.shape[3]]
            x = jnp.concatenate([x, skip], axis=-1)
            x = _DoubleConv3d(self.f_maps * 2**level, name=f"dec_{level}")(x)
        x = nn.Conv(self.out_channels, (1, 1, 1), name="final")(x)
        return x.transpose(0, 4, 1, 2, 3)
