"""Output heads: point-wise TSDF head (GenNerf) and volumetric multi-scale
TSDF head (VoxelNet).

Reference: src/models/components/heads3d.py.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.value_transforms import log_transform
from .common import xavier_uniform_tanh, zeros_init


class TSDFHeadSimple(nn.Module):
    """Linear -> tanh point-wise TSDF regressor (reference heads3d.py:24-50).

    `smoothing` scales the tanh output (the multi-scale head's
    label_smoothing idea, reference heads3d.py:95): at smoothing > 1 the
    +-1 targets sit inside tanh's range, so saturated regions keep
    gradient and under-trained fields don't freeze at exactly +-1 (which
    mesh extraction treats as unknown/outside -> empty meshes).
    """

    smoothing: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(1, kernel_init=xavier_uniform_tanh(), bias_init=zeros_init,
                     dtype=self.dtype)(x)
        y = jnp.tanh(y)
        # static branch: smoothing=1.0 (the default) stays bit-identical to
        # the reference math the parity oracles pin
        return y if self.smoothing == 1.0 else y * self.smoothing


class TSDFHead(nn.Module):
    """Multi-scale volumetric TSDF head with coarse-to-fine sparsification
    (reference heads3d.py:84-176).

    Operates on the multi-scale volume list from the 3D backbone (coarsest
    last in `voxel_sizes` order: the reference reverses channels so decoder i
    consumes scale i counted fine->coarse... concretely: voxel_sizes =
    [final*2^i][::-1] (coarse first) and decoders over channels[:-1][::-1]).
    """

    channels: Sequence[int]
    voxel_size: float
    multi_scale: bool = True
    loss_weight: float = 1.0
    label_smoothing: float = 1.05
    loss_split: str = "pred"  # 'none' | 'pred'
    loss_log_transform: bool = True
    loss_log_transform_shift: float = 1.0
    sparse_threshold: Sequence[float] = (0.99, 0.99, 0.99)
    dtype: jnp.dtype = jnp.float32

    @property
    def voxel_sizes(self):
        final = int(self.voxel_size * 100)
        scales = len(self.channels) - 1
        if self.multi_scale:
            return [final * 2**i for i in range(scales)][::-1]
        return [final]

    @nn.compact
    def __call__(
        self, xs: Sequence[jnp.ndarray], targets: Optional[Dict[str, jnp.ndarray]] = None
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        """
        Args:
            xs: list of (B, C_i, nx_i, ny_i, nz_i) volumes, coarse -> fine
                (the backbone's up-path outputs).
            targets: optional dict with 'vol_%02d_tsdf' keys, each
                (B, 1, nx_i, ny_i, nz_i).

        Returns:
            (outputs, losses) — outputs['vol_%02d_tsdf'] per scale.
        """
        output: Dict[str, jnp.ndarray] = {}
        losses: Dict[str, jnp.ndarray] = {}
        mask_surface_pred = []

        if not self.multi_scale:
            xs = xs[-1:]

        voxel_sizes = self.voxel_sizes
        for i, x in enumerate(xs):
            # 1x1x1 conv == per-voxel Dense over channels (channels-first in)
            h = x.transpose(0, 2, 3, 4, 1)
            tsdf = nn.Dense(1, use_bias=False, dtype=self.dtype, name=f"decoder_{i}")(h)
            tsdf = jnp.tanh(tsdf).transpose(0, 4, 1, 2, 3) * self.label_smoothing

            if self.loss_split == "pred" and i > 0:
                prev = output["vol_%02d_tsdf" % voxel_sizes[i - 1]]
                prev_up = _upsample2x_nearest3d(prev)
                mask_prev = jnp.abs(prev_up) < self.sparse_threshold[i - 1]
                # outside the predicted surface band, propagate the coarse
                # sign at .999 so marching cubes doesn't close surfaces
                tsdf = jnp.where(mask_prev, tsdf, jnp.sign(prev_up) * 0.999)
                mask_surface_pred.append(mask_prev)

            # output volumes run at an f32 floor regardless of compute dtype
            # (they feed npz export, marching cubes, and f32 loss math
            # downstream); f64 passes through for full-precision parity runs
            out_dtype = jnp.promote_types(jnp.float32, tsdf.dtype)
            output["vol_%02d_tsdf" % voxel_sizes[i]] = tsdf.astype(out_dtype)

        if targets is not None:
            for i, vs in enumerate(voxel_sizes):
                key = "vol_%02d_tsdf" % vs
                # tolerate partial supervision: a predict-time batch may
                # carry only the finest-scale GT (the data layer loads
                # voxel_types x ONE voxel_size; multi-scale targets come
                # from the trainer's datamodule) — skip absent scales
                if key not in targets:
                    continue
                loss_dtype = jnp.promote_types(
                    jnp.float32, jnp.result_type(output[key], targets[key])
                )
                pred = output[key].astype(loss_dtype)
                trgt = targets[key].astype(loss_dtype)
                mask_observed = trgt < 1
                mask_outside = jnp.all(trgt == 1, axis=-1, keepdims=True)
                if self.loss_log_transform:
                    pred = log_transform(pred, self.loss_log_transform_shift)
                    trgt = log_transform(trgt, self.loss_log_transform_shift)
                loss = jnp.abs(pred - trgt) * self.loss_weight
                wanted = mask_observed | mask_outside
                if self.loss_split == "pred" and i > 0:
                    wanted = wanted & mask_surface_pred[i - 1]
                denom = jnp.maximum(wanted.sum(), 1)
                losses[key + "_loss"] = jnp.where(wanted, loss, 0.0).sum() / denom
        return output, losses


def _upsample2x_nearest3d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, nx, ny, nz) -> 2x nearest upsampling (torch F.interpolate
    default mode='nearest', reference heads3d.py:127)."""
    x = jnp.repeat(x, 2, axis=2)
    x = jnp.repeat(x, 2, axis=3)
    return jnp.repeat(x, 2, axis=4)


class VoxelHeads(nn.Module):
    """Container of volumetric heads (reference heads3d.py:53-81).
    Currently the TSDF head; semseg/color heads are disabled in the
    reference (commented out) and omitted here."""

    channels: Sequence[int]
    voxel_size: float
    use_tsdf: bool = True
    tsdf_multi_scale: bool = True
    tsdf_loss_weight: float = 1.0
    tsdf_label_smoothing: float = 1.05
    tsdf_loss_split: str = "pred"
    tsdf_loss_log_transform: bool = True
    tsdf_loss_log_transform_shift: float = 1.0
    tsdf_sparse_threshold: Sequence[float] = (0.99, 0.99, 0.99)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, targets=None):
        outputs: Dict[str, jnp.ndarray] = {}
        losses: Dict[str, jnp.ndarray] = {}
        if self.use_tsdf:
            out, loss = TSDFHead(
                channels=self.channels,
                voxel_size=self.voxel_size,
                multi_scale=self.tsdf_multi_scale,
                loss_weight=self.tsdf_loss_weight,
                label_smoothing=self.tsdf_label_smoothing,
                loss_split=self.tsdf_loss_split,
                loss_log_transform=self.tsdf_loss_log_transform,
                loss_log_transform_shift=self.tsdf_loss_log_transform_shift,
                sparse_threshold=self.tsdf_sparse_threshold,
                dtype=self.dtype,
                name="tsdf_head",
            )(xs, targets)
            outputs.update(out)
            losses.update(loss)
        return outputs, losses
