"""VoxelNet: Atlas-style dense voxel TSDF model.

Reference: src/models/voxel_net.py — per-frame 2D features back-projected
and accumulated into a voxel volume (same fold as GenNerf), refined by the
3D encoder-decoder, regressed to multi-scale TSDF volumes by VoxelHeads.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.projection import backproject_fold
from .backbone3d import EncoderDecoder
from .config import VoxelNetConfig
from .heads import VoxelHeads
from .spatial_encoder import SpatialEncoder


class VolumeRepr(NamedTuple):
    volume: jnp.ndarray  # (B, C, nx, ny, nz)
    valid: jnp.ndarray   # (B, 1, nx, ny, nz)


class VoxelNet(nn.Module):
    cfg: VoxelNetConfig
    # compute dtype (bf16-mixed training via trainer.precision); params,
    # norms, the volume accumulator, and all losses stay f32
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        s = self.cfg.encoder.spatial
        # remat: recompute the 2D backbone's activations in backward — at
        # (B*T) folded frames they are the largest activation block. With
        # frame_chunk the remat boundary moves out to the chunk fold.
        spatial_cls = (
            nn.remat(SpatialEncoder, static_argnums=(2,))
            if (self.cfg.remat and not s.frame_chunk) else SpatialEncoder
        )
        self.spatial = spatial_cls(
            backbone=s.backbone,
            num_layers=s.num_layers,
            upsample_interp=s.upsample_interp,
            feature_scale=s.feature_scale,
            use_first_pool=s.use_first_pool,
            norm_type=s.norm_type,
            blur_image=s.blur_image,
            kernel_size=s.kernel_size,
            sigma=s.sigma,
            out_channels=self.cfg.backbone3d.channels[0],  # reference voxel_net.py:40
            dtype=self.dtype,
        )
        b = self.cfg.backbone3d
        self.backbone3d = EncoderDecoder(
            channels=b.channels,
            layers_down=b.layers_down,
            layers_up=b.layers,
            norm=b.norm,
            drop=b.drop,
            cond_proj=b.conditional_skip,
            remat=self.cfg.remat,
            dtype=self.dtype,
        )
        h = self.cfg.heads
        self.heads3d = VoxelHeads(
            channels=b.channels,
            voxel_size=self.cfg.voxel_size,
            use_tsdf=h.use_tsdf,
            tsdf_multi_scale=h.tsdf_multi_scale,
            tsdf_loss_weight=h.tsdf_loss_weight,
            tsdf_label_smoothing=h.tsdf_label_smoothing,
            tsdf_loss_split=h.tsdf_loss_split,
            tsdf_loss_log_transform=h.tsdf_loss_log_transform,
            tsdf_loss_log_transform_shift=h.tsdf_loss_log_transform_shift,
            tsdf_sparse_threshold=h.tsdf_sparse_threshold,
            dtype=self.dtype,
        )

    @property
    def voxel_sizes(self):
        final = int(self.cfg.voxel_size * 100)
        return [final * 2**i for i in range(len(self.cfg.backbone3d.layers_down) - 1)]

    def encode(
        self,
        projection: jnp.ndarray,
        image: jnp.ndarray,
        depth: jnp.ndarray,
        voxel_dim: Tuple[int, int, int],
        origin: jnp.ndarray,
        train: bool = False,
    ) -> VolumeRepr:
        """(B, T, ...) frames -> accumulated feature volume (scan over T).

        spatial.frame_chunk > 0 processes the frame axis in chunks with the
        f32 accumulator carrying state (only one chunk's ResNet pyramid live
        at a time — see SpatialEncoderConfig.frame_chunk)."""
        cfg = self.cfg
        B, T = projection.shape[:2]
        chunk = cfg.encoder.spatial.frame_chunk
        if 0 < chunk < T:
            # whole chunk (2D encode + backproject) is one remat region:
            # only the (C, V) volume contribution becomes a residual (see
            # GenNerf.encode for the measured motivation)
            def chunk_fold(mdl, imgs_c, proj_c, origin_):
                return backproject_fold(
                    mdl.spatial(imgs_c, train), proj_c, image.shape[-2:],
                    voxel_dim, cfg.voxel_size, origin_, remat=False,
                )

            fold = nn.remat(chunk_fold) if cfg.remat else chunk_fold
            volume = valid = None
            for t0 in range(0, T, chunk):
                t1 = min(t0 + chunk, T)
                imgs_c = image[:, t0:t1].reshape(B * (t1 - t0), *image.shape[2:])
                v, m = fold(self, imgs_c, projection[:, t0:t1], origin)
                volume = v if volume is None else volume + v
                valid = m if valid is None else valid + m
            return VolumeRepr(volume, valid)
        images_bt = image.reshape(B * T, *image.shape[2:])
        feat_2d = self.spatial(images_bt, train)  # (B*T, C, H', W')
        volume, valid = backproject_fold(
            feat_2d, projection, image.shape[-2:], voxel_dim,
            cfg.voxel_size, origin, remat=cfg.remat,
        )
        return VolumeRepr(volume, valid)

    def refine(self, repr: VolumeRepr, targets=None, train: bool = False):
        """Normalize the accumulator, run the 3D backbone and heads
        (reference voxel_net.py:147-175)."""
        volume = repr.volume / jnp.maximum(repr.valid, 1e-12)
        volume = jnp.where(repr.valid > 0, volume, 0.0)
        xs = self.backbone3d(volume, train=train)
        return self.heads3d(xs, targets)

    def __call__(self, projection, image, depth, voxel_dim, origin, targets=None, train: bool = False):
        repr = self.encode(projection, image, depth, tuple(voxel_dim), origin, train=train)
        return self.refine(repr, targets, train=train)
