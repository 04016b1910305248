"""Atlas-style 3D encoder-decoder CNN for refining feature volumes.

Reference: src/models/components/backbone3d.py: strided-conv down path with
BasicBlock3d residual stacks, trilinear-upsample up path with (optionally
masked) projected skip connections; zero-init'd residual norms.

TPU layout: volumes run channels-last (B, nx, ny, nz, C) internally so the
channel axis rides the 128-lane dimension; API boundary is channels-first
for parity with the accumulator layout.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _norm_dtype(compute_dtype) -> jnp.dtype:
    """Norm compute dtype: f32 floor under mixed precision (bf16 stats are
    numerically unsafe), but f64 stays f64 so full-precision parity runs
    (scripts/local/trained_parity*.py) are not silently truncated."""
    return jnp.float64 if compute_dtype == jnp.float64 else jnp.float32


class _Norm3d(nn.Module):
    """'BN' | 'nnSyncBN' | 'GN' | '' over channels-last 3D tensors."""

    norm: str = "BN"
    axis_name: Optional[str] = None
    zero_init: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        scale_init = nn.initializers.zeros if self.zero_init else nn.initializers.ones
        if self.norm in ("BN", "nnSyncBN"):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                axis_name=self.axis_name if self.norm == "nnSyncBN" else None,
                scale_init=scale_init, dtype=_norm_dtype(self.dtype),
            )(x)
        if self.norm == "GN":
            groups = min(32, x.shape[-1])
            return nn.GroupNorm(num_groups=groups, scale_init=scale_init,
                                dtype=_norm_dtype(self.dtype))(x)
        if self.norm == "":
            return x
        raise ValueError(self.norm)


class BasicBlock3d(nn.Module):
    """3x3x3 residual block (reference backbone3d.py:56-95). The second norm
    is zero-initialized so the block starts as identity."""

    planes: int
    stride: int = 1
    norm: str = "BN"
    drop: float = 0.0
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (3, 3, 3), strides=self.stride, padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = _Norm3d(self.norm, self.axis_name, dtype=self.dtype, name="bn1")(out, train)
        if self.drop > 0:
            out = nn.Dropout(self.drop, deterministic=not train)(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = _Norm3d(self.norm, self.axis_name, zero_init=True, dtype=self.dtype, name="bn2")(out, train)
        if self.drop > 0:
            out = nn.Dropout(self.drop, deterministic=not train)(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1, 1), strides=self.stride, use_bias=False, dtype=self.dtype, name="down")(x)
        return nn.relu(out + identity)


class ConditionalProjection(nn.Module):
    """Projected skip connection, optionally masked to observed voxels
    (reference backbone3d.py:98-131)."""

    n: int
    norm: str = "BN"
    condition: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, mask, train: bool = False):
        x = nn.Conv(self.n, (1, 1, 1), use_bias=False, dtype=self.dtype, name="conv")(x)
        if self.condition:
            x = jnp.where(mask, x, y)
        x = _Norm3d(self.norm, dtype=self.dtype, name="norm")(x, train)
        return nn.relu(x)


def _trilinear_up2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x trilinear upsampling, align_corners=False (half-pixel), NDHWC-style
    channels-last; matches torch F.interpolate(mode='trilinear')."""
    B, nx, ny, nz, C = x.shape
    return jax.image.resize(x, (B, 2 * nx, 2 * ny, 2 * nz, C), method="trilinear")


class EncoderDecoder(nn.Module):
    """3D network to refine feature volumes (reference backbone3d.py:134-208).

    Input/output channels-first (B, C, nx, ny, nz); returns the list of
    up-path volumes coarse -> fine (same contract as the reference).
    """

    channels: Sequence[int] = (32, 64, 128)
    layers_down: Sequence[int] = (1, 2, 3)
    layers_up: Sequence[int] = (3, 3, 3)
    norm: str = "BN"
    drop: float = 0.0
    cond_proj: bool = True
    axis_name: Optional[str] = None
    # rematerialize every residual block in backward: activations of the
    # 3x3x3 conv stacks dominate training HBM at reference-scale volumes
    # (B x C x 160x160x64 and up); remat trades one extra forward per block
    remat: bool = False
    # compute dtype for convs (bf16-mixed); norms and params stay f32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        Block = (
            nn.remat(BasicBlock3d, static_argnums=(2,)) if self.remat
            else BasicBlock3d
        )
        x = x.transpose(0, 2, 3, 4, 1)  # channels-last
        if self.cond_proj:
            valid_mask = jnp.any(x != 0, axis=-1, keepdims=True)

        xs = []
        # down path
        for j in range(self.layers_down[0]):
            x = Block(self.channels[0], norm=self.norm, drop=self.drop,
                             axis_name=self.axis_name, dtype=self.dtype,
                             name=f"down0_b{j}")(x, train)
        xs.append(x)
        for i in range(1, len(self.channels)):
            x = nn.Conv(self.channels[i], (3, 3, 3), strides=2, padding=1,
                        use_bias=(self.norm == ""), dtype=self.dtype,
                        name=f"down{i}_conv")(x)
            x = _Norm3d(self.norm, self.axis_name, dtype=self.dtype, name=f"down{i}_norm")(x, train)
            if self.drop > 0:
                x = nn.Dropout(self.drop, deterministic=not train)(x)
            x = nn.relu(x)
            for j in range(self.layers_down[i]):
                x = Block(self.channels[i], norm=self.norm, drop=self.drop,
                                 axis_name=self.axis_name, dtype=self.dtype,
                                 name=f"down{i}_b{j}")(x, train)
            xs.append(x)

        # up path
        xs = xs[::-1]
        rev = list(self.channels)[::-1]
        out = []
        n_up = len(rev) - 1
        for i in range(n_up):
            x = _trilinear_up2x(x)
            x = nn.Conv(rev[i + 1], (1, 1, 1), use_bias=False, dtype=self.dtype, name=f"up{i}_conv")(x)
            if self.cond_proj:
                scale = 2 ** (n_up - i - 1)
                m = valid_mask.astype(jnp.float32)
                if scale > 1:
                    m = m[:, ::scale, ::scale, ::scale]  # nearest downsample
                mask = m[:, : x.shape[1], : x.shape[2], : x.shape[3]] != 0
            else:
                mask = None
            y = ConditionalProjection(rev[i + 1], self.norm, self.cond_proj,
                                      dtype=self.dtype,
                                      name=f"proj{i}")(xs[i + 1], x, mask, train)
            x = (x + y) / 2
            for j in range(self.layers_up[i]):
                x = Block(rev[i + 1], norm=self.norm, drop=self.drop,
                                 axis_name=self.axis_name, dtype=self.dtype,
                                 name=f"up{i}_b{j}")(x, train)
            out.append(x.transpose(0, 4, 1, 2, 3))
        return out
