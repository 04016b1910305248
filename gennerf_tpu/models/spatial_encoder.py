"""Pixel-aligned 2D spatial encoder.

Reference: src/models/components/spatial_encoder.py (featurenerf-derived):
optional Gaussian pre-blur, optional rescale, ResNet stem + first
`num_layers` stages, every stage bilinearly upsampled to the stem
resolution and channel-concatenated; optional 1x1 conv to `out_channels`.

latent sizes by num_layers: resnet18/34 -> [0, 64, 128, 256, 512, 1024],
resnet50 (concat of widths) -> 64+256+512+1024(+2048) = 1856 at
num_layers=4 (the reference hardcodes 1856, spatial_encoder.py:77).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.value_transforms import apply_gaussian_smoothing
from .resnet import RESNET_SPECS, ResNetStages


def spatial_latent_size(backbone: str, num_layers: int) -> int:
    """Concatenated channel count of [stem, stage1..stage_{num_layers-1}].

    resnet18/34: [0, 64, 128, 256, 512, 1024][num_layers];
    resnet50 at num_layers=4: 64+256+512+1024 = 1856 (the reference's
    hardcoded value, spatial_encoder.py:77).
    """
    block, _ = RESNET_SPECS[backbone]
    widths = [64] + [64 * (2**i) * block.expansion for i in range(4)]
    return sum(widths[:num_layers])


def _resize_bilinear_align_corners(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Bilinear resize with align_corners=True semantics (torch
    F.interpolate(..., align_corners=True)), NHWC."""
    B, H, W, C = x.shape
    OH, OW = out_hw
    if (OH, OW) == (H, W):
        return x
    ys = jnp.linspace(0.0, H - 1.0, OH)
    xs = jnp.linspace(0.0, W - 1.0, OW)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    # weights in the INPUT dtype: f32 weights would silently promote bf16
    # feature maps to f32 — at 640x480x512ch per frame that doubling of
    # the upsampled stage maps is what pushed the T=8 spatial step past
    # 16 GB (they are the largest remat-boundary residuals)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]
    g = x[:, y0][:, :, x0]
    gx1 = x[:, y0][:, :, x1]
    gy1 = x[:, y1][:, :, x0]
    gxy = x[:, y1][:, :, x1]
    top = g * (1 - wx) + gx1 * wx
    bot = gy1 * (1 - wx) + gxy * wx
    return top * (1 - wy) + bot * wy


class SpatialEncoder(nn.Module):
    """2D (pixel-aligned) image encoder. NCHW at the API boundary."""

    backbone: str = "resnet34"
    num_layers: int = 4
    upsample_interp: str = "bilinear"
    feature_scale: float = 1.0
    use_first_pool: bool = True
    norm_type: str = "batch"
    blur_image: bool = False
    kernel_size: int = 5
    sigma: float = 1.0
    out_channels: Optional[int] = None
    axis_name: Optional[str] = None
    # compute dtype for convs (bf16-mixed); norms and params stay f32
    dtype: jnp.dtype = jnp.float32

    @property
    def latent_size(self) -> int:
        c = spatial_latent_size(self.backbone, self.num_layers)
        return self.out_channels if self.out_channels else c

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """
        Args:
            x: (B, 3, H, W) images.

        Returns:
            (B, latent_size, H', W') pixel-aligned features; H' = H/2 * feature_scale.
        """
        if self.blur_image:
            x = apply_gaussian_smoothing(x, self.kernel_size, self.sigma)
        x = x.transpose(0, 2, 3, 1)  # NHWC
        if self.feature_scale != 1.0:
            B, H, W, C = x.shape
            OH, OW = int(H * self.feature_scale), int(W * self.feature_scale)
            if self.feature_scale > 1.0:
                x = _resize_bilinear_align_corners(x, (OH, OW))
            else:
                # 'area' downscale == average pooling for integer factors
                f = int(round(1.0 / self.feature_scale))
                x = nn.avg_pool(x, (f, f), strides=(f, f))

        feats = ResNetStages(
            backbone=self.backbone,
            num_stages=self.num_layers - 1,  # stem counts as the first map
            use_first_pool=self.use_first_pool,
            norm_type=self.norm_type,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="resnet",
        )(x, train=train)

        target_hw = feats[0].shape[1:3]
        ups = [
            _resize_bilinear_align_corners(f, target_hw) if self.upsample_interp == "bilinear" else f
            for f in feats
        ]
        latent = jnp.concatenate(ups, axis=-1)
        if self.out_channels:
            latent = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="proj")(latent)
        return latent.transpose(0, 3, 1, 2)  # back to NCHW
