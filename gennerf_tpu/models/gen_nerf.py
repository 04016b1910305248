"""GenNerf: generalizable neural field for scene-level TSDF reconstruction.

Reference: src/models/model.py (GenNerf LightningModule). TPU-first
re-design:

  * The stateful accumulator contract ("encode() may be called multiple
    times", model.py:77-150, mutating self.volume/self.valid/self.c_plane)
    becomes an explicit functional fold: `encode` consumes (B, T, ...) frame
    stacks and `lax.scan`s the volume accumulation over T at O(1) memory,
    returning an immutable `SceneRepr` pytree. Streaming/incremental use
    maps to `merge_scene_reprs` on successive encodes.
  * The decoder is a pure function of (params, SceneRepr, xyz) — N query
    points batch into one (B·N, d) MLP pass on the MXU; gradients of TSDF
    w.r.t. xyz (eikonal) come from jax.vjp instead of autograd.grad
    (reference needed custom double-backward grid_sample, utils.py:1117).

Feature layout parity (model.py:163-248): decoder latent =
[triplane features (c_dim) ; volume features (spatial)...]; the MLP treats
PE(xyz) as its per-block injected latent (d_latent) and the encoder features
as its input (d_in) — note the reference's inverted naming.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.coords import normalize_3d_coordinate, normalize_coordinate
from ..ops.interpolation import sample_plane_feature, trilinear_interpolation
from ..ops.projection import backproject_fold, get_3d_points
from ..ops.sampling import farthest_point_sample
from .config import GenNerfConfig
from .heads import TSDFHeadSimple
from .pointnet import FeaturePlaneMerger, LocalPoolPointnet
from .positional_encoding import positional_encoding, positional_encoding_dim
from .resnetfc import ResnetFC
from .spatial_encoder import SpatialEncoder


class SceneRepr(NamedTuple):
    """Immutable scene encoding (the reference's self.volume/self.valid/
    self.c_plane triple)."""

    volume: Optional[jnp.ndarray]  # (B, C, nx, ny, nz) accumulated features
    valid: Optional[jnp.ndarray]   # (B, 1, nx, ny, nz) observation counts
    planes: Optional[Dict[str, jnp.ndarray]]  # plane -> (B, c_dim, r, r)


class GenNerf(nn.Module):
    cfg: GenNerfConfig
    teacher: Optional[nn.Module] = None  # VLM teacher for use_auxiliary
    dtype: jnp.dtype = jnp.float32  # decoder compute dtype (bf16 = MXU full rate)

    def setup(self):
        enc = self.cfg.encoder
        if enc.use_auxiliary and self.teacher is None:
            # fail fast: encode() would silently drop the auxiliary_dim
            # channels the decoder's d_in was sized for, surfacing later as
            # an opaque shape-mismatch deep in ResnetFC (or an empty
            # concatenate when use_spatial is also off)
            raise ValueError(
                "encoder.use_auxiliary=True requires a teacher module "
                "(pass teacher=make_teacher(cfg) to GenNerf; teacher type "
                "'none' returns None)"
            )
        if enc.use_spatial:
            s = enc.spatial
            # remat: recompute the 2D backbone's activations in backward —
            # at (B*T) folded frames they are the largest activation block.
            # With frame_chunk the remat boundary moves OUT to the whole
            # chunk fold (see encode) — don't double-wrap the encoder.
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
                out_channels=s.out_channels,
                dtype=self.dtype,
            )
        if enc.use_pointnet:
            p = enc.pointnet
            self.pointnet = LocalPoolPointnet(
                c_dim=p.c_dim,
                dim=p.dim,
                hidden_dim=p.hidden_dim,
                scatter_type=p.scatter_type,
                use_unet=p.unet,
                unet_depth=p.unet_depth,
                unet_merge_mode=p.unet_merge_mode,
                unet_start_filts=p.unet_start_filts,
                plane_resolution=p.plane_resolution,
                grid_resolution=p.grid_resolution,
                plane_type=p.plane_type,
                padding=p.padding,
                n_blocks=p.n_blocks,
                use_unet3d=p.unet3d,
                unet3d_f_maps=p.unet3d_f_maps,
                unet3d_num_levels=p.unet3d_num_levels,
                dtype=self.dtype,
            )
            self.merger = FeaturePlaneMerger(
                strategy=enc.plane_merger.strategy,
                alpha=enc.plane_merger.alpha,
                c_dim=p.c_dim,
                dtype=self.dtype,
            )
        d_code = (
            positional_encoding_dim(self.cfg.code.num_freqs, 3, self.cfg.code.include_input)
            if self.cfg.use_code
            else 3
        )
        m = self.cfg.mlp
        self.mlp = ResnetFC(
            d_in=self.cfg.encoder_latent,
            d_out=m.d_out_geo + m.d_out_sem,
            n_blocks=m.n_blocks,
            d_latent=d_code,
            d_hidden=m.d_hidden,
            beta=m.beta,
            combine_layer=m.combine_layer,
            combine_type=m.combine_type,
            use_spade=m.use_spade,
            use_layer_norm=m.use_layer_norm,
            alpha=m.alpha,
            dtype=self.dtype,
        )
        self.head_geo = TSDFHeadSimple(
            smoothing=getattr(self.cfg.mlp, "head_smoothing", 1.0),
            dtype=self.dtype)

    def _plane_coords(self, xyz: jnp.ndarray) -> jnp.ndarray:
        """World points -> the coordinate frame the triplane operations see.

        With pointnet.normalize_coords, the TRAINING volume maps to the
        ~[-0.5, 0.5] cube ConvONet's normalize_coordinate expects (fixes the
        reference flaw of feeding raw meters, which clamps most of the
        scene onto the plane border); otherwise identity (reference parity).
        """
        p = self.cfg.encoder.pointnet
        if not p.normalize_coords:
            return xyz
        extent = jnp.asarray(self.cfg.voxel_dim_train, jnp.float32) * self.cfg.voxel_size
        scale = jnp.max(extent)
        return (xyz - extent / 2.0) / scale

    # -- encoder -------------------------------------------------------------
    def encode(
        self,
        projection: jnp.ndarray,
        image: jnp.ndarray,
        depth: jnp.ndarray,
        key: jax.Array,
        voxel_dim: Tuple[int, int, int],
        origin: jnp.ndarray,
        train: bool = False,
    ) -> SceneRepr:
        """Encode T posed RGB-D frames into the scene representation.

        Args:
            projection: (B, T, 3, 4) world->image.
            image: (B, T, 3, H, W).
            depth: (B, T, H, W).
            key: rng for FPS seeding.
            voxel_dim: static (nx, ny, nz) of the feature volume.
            origin: (3,) world origin of the volume.

        Returns:
            SceneRepr.
        """
        cfg = self.cfg
        enc = cfg.encoder
        B, T = projection.shape[:2]

        volume = valid = None
        if enc.use_spatial or enc.use_auxiliary:
            # flax modules can't be called inside lax.scan body across module
            # boundaries; run the 2D encoder on the folded (B*T) frame axis
            # (one big batched conv pass — better MXU utilization than a
            # python loop), then scan the backprojection accumulation.
            # With spatial.frame_chunk the frame axis is instead processed
            # in chunks accumulating into the f32 volume (the reference's
            # per-frame encode loop, model.py:100): only one chunk's ResNet
            # pyramid is live at a time — the lever that fits reference
            # resolution (T=8 x 640x480) on a 16 GB chip. BN running stats
            # update once per chunk instead of once per step (same
            # information, momentum applied T/chunk times).
            def encode_frames(imgs_bt):
                f2d = []
                if enc.use_spatial:
                    f2d.append(self.spatial(imgs_bt, train))
                if enc.use_auxiliary and self.teacher is not None:
                    f2d.append(self.teacher(imgs_bt))
                return jnp.concatenate(f2d, axis=1)  # (B*chunk, C, H', W')

            # depth intrinsics scale: the reference backprojects the
            # feature map's pixel grid (the 2D encoder may change
            # resolution), so backproject_fold rescales the projections to
            # feature pixels; the T-frame running sum stays f32 (bf16-mixed
            # accumulator policy).
            chunk = enc.spatial.frame_chunk if enc.use_spatial else 0
            if 0 < chunk < T:
                # the WHOLE chunk (2D encode + backproject) is one remat
                # region: only the (C, V) volume contribution crosses the
                # boundary into autodiff residuals. Rematting just the
                # encoder still saved every chunk's full-resolution latent
                # (512ch x 640x480 per frame) as a boundary output —
                # measured 18.6 GB for T=8, over the 15.75 GB chip.
                def chunk_fold(mdl, imgs_c, proj_c, origin_):
                    f2d = []
                    if enc.use_spatial:
                        f2d.append(mdl.spatial(imgs_c, train))
                    if enc.use_auxiliary and mdl.teacher is not None:
                        f2d.append(mdl.teacher(imgs_c))
                    return backproject_fold(
                        jnp.concatenate(f2d, axis=1), proj_c,
                        image.shape[-2:], voxel_dim, cfg.voxel_size,
                        origin_, remat=False,
                    )

                fold = nn.remat(chunk_fold) if cfg.remat else chunk_fold
                for t0 in range(0, T, chunk):
                    t1 = min(t0 + chunk, T)
                    imgs_c = image[:, t0:t1].reshape(B * (t1 - t0), *image.shape[2:])
                    v, m = fold(self, imgs_c, projection[:, t0:t1], origin)
                    volume = v if volume is None else volume + v
                    valid = m if valid is None else valid + m
            else:
                volume, valid = backproject_fold(
                    encode_frames(image.reshape(B * T, *image.shape[2:])),
                    projection, image.shape[-2:], voxel_dim,
                    cfg.voxel_size, origin, remat=cfg.remat,
                )

        planes = None
        if enc.use_pointnet:
            npoint = enc.pointnet.num_sparse_points
            # FPS each frame's unprojected depth map, batched over (B*T)
            xyz_map = get_3d_points(
                depth.reshape(B * T, *depth.shape[2:]),
                projection.reshape(B * T, 3, 4),
            )  # (B*T, H, W, 3)
            xyz = xyz_map.reshape(B * T, -1, 3)
            # invalid (depth==0) points unproject to the camera center —
            # harmless for FPS sparsification as in the reference
            presample = enc.pointnet.fps_presample
            if presample and xyz.shape[1] > presample:
                # independent uniform presample PER FRAME (a shared subset
                # would correlate the FPS input across all B*T frames).
                # Sampling with replacement: collisions are vanishingly rare
                # at presample << H*W and harmless to FPS (duplicates have
                # distance 0 and are never re-picked).
                key, k_pre = jax.random.split(key)
                sel = jax.random.randint(
                    k_pre, (xyz.shape[0], presample), 0, xyz.shape[1]
                )
                xyz = jnp.take_along_axis(xyz, sel[..., None], axis=1)
            if enc.pointnet.sparsifier == "voxel_hash":
                from ..ops.sampling import voxel_hash_downsample

                sparse, _ = voxel_hash_downsample(key, xyz, npoint)
            else:
                sparse, _ = farthest_point_sample(key, xyz, npoint)  # (B*T, npoint, 3)
            accum = sparse.reshape(B, T, npoint, 3).reshape(B, T * npoint, 3)
            planes = self.pointnet(self._plane_coords(accum))

        return SceneRepr(volume=volume, valid=valid, planes=planes)

    def merge(self, new: SceneRepr, old: SceneRepr) -> SceneRepr:
        """Fold a new encode into a running representation (the reference's
        'encode can be called multiple times' contract, model.py:80-82)."""
        volume = new.volume if old.volume is None else old.volume + new.volume
        valid = new.valid if old.valid is None else old.valid + new.valid
        planes = new.planes if old.planes is None else self.merger(new.planes, old.planes)
        return SceneRepr(volume, valid, planes)

    # -- decoder -------------------------------------------------------------
    def map_features(self, repr: SceneRepr, xyz: jnp.ndarray, origin: jnp.ndarray) -> jnp.ndarray:
        """Gather per-point features from the scene representation
        (reference model.py:163-204)."""
        cfg = self.cfg
        feats = []
        if cfg.encoder.use_pointnet and repr.planes is not None:
            p = cfg.encoder.pointnet
            xyz_pn = self._plane_coords(xyz)
            feat_pn = 0.0
            if "grid" in repr.planes:
                # ConvONet grid variant: trilinear sample of the feature grid
                p_nor = normalize_3d_coordinate(xyz_pn, padding=p.padding)
                vol_cl = repr.planes["grid"].transpose(0, 2, 3, 4, 1)
                grid_reso = vol_cl.shape[1]
                feat_pn += trilinear_interpolation(
                    vol_cl, p_nor, jnp.zeros(3), 1.0 / grid_reso
                )
            for plane in ("xz", "xy", "yz"):
                if plane in repr.planes:
                    coords = normalize_coordinate(xyz_pn, padding=p.padding, plane=plane)
                    feat_pn += sample_plane_feature(repr.planes[plane], coords, mode=p.sample_mode)
            feats.append(feat_pn)
        if repr.volume is not None:
            vol = repr.volume / jnp.maximum(repr.valid, 1e-12)
            vol = jnp.where(repr.valid > 0, vol, 0.0)
            vol_cl = vol.transpose(0, 2, 3, 4, 1)  # channels-last
            feats.append(trilinear_interpolation(vol_cl, xyz, origin, cfg.voxel_size))
        return jnp.concatenate(feats, axis=-1)

    def decode(self, repr: SceneRepr, xyz: jnp.ndarray, origin: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Predict (feat_geo, feat_sem, tsdf) at world points xyz (B, N, 3)
        (reference model.py:207-248)."""
        cfg = self.cfg
        B, N, _ = xyz.shape
        feat = self.map_features(repr, xyz, origin)
        code = (
            positional_encoding(
                xyz.reshape(-1, 3),
                cfg.code.num_freqs,
                cfg.code.freq_factor,
                cfg.code.include_input,
            ).reshape(B, N, -1)
            if cfg.use_code
            else xyz
        )
        mlp_in = jnp.concatenate([code, feat], axis=-1)
        mlp_out = self.mlp(mlp_in)
        d_geo = cfg.mlp.d_out_geo
        feat_geo = mlp_out[..., :d_geo]
        feat_sem = mlp_out[..., d_geo:]
        tsdf = self.head_geo(feat_geo)
        return {"feat_geo": feat_geo, "feat_sem": feat_sem, "tsdf": tsdf, "feat": feat}

    def decode_with_grad(self, repr: SceneRepr, xyz: jnp.ndarray, origin: jnp.ndarray):
        """Decode plus d(tsdf)/d(xyz) (for eikonal/gradient losses).

        jax.vjp with a ones cotangent == the reference's autograd.grad
        (utils.py:636-648), but needs no double-backward-safe custom ops.
        The vjp's primal outputs ARE the decode outputs (tsdf has a single
        channel, so a ones cotangent on it and zeros elsewhere is exactly
        d(tsdf)/d(xyz)) — one decoder forward total, not two.
        """
        out, vjp_fn = jax.vjp(lambda p: self.decode(repr, p, origin), xyz)
        cot = jax.tree.map(jnp.zeros_like, out)
        cot["tsdf"] = jnp.ones_like(out["tsdf"])
        (grad,) = vjp_fn(cot)
        out = dict(out)
        out["grad"] = grad
        return out

    def __call__(self, projection, image, depth, xyz, key, voxel_dim, origin, train: bool = False):
        """Convenience end-to-end pass (used for init and the graft entry)."""
        repr = self.encode(projection, image, depth, key, tuple(voxel_dim), origin, train=train)
        return self.decode(repr, xyz, origin)
