"""Conditioned fully-connected ResNet decoder (pixelNeRF-style).

Reference: src/models/components/resnetfc.py. This is the decoder hot path —
B·N query points through n_blocks of two (d_hidden × d_hidden) matmuls with
per-block latent injection. Channel dims are multiples of 128 by default
(d_hidden=512) so every matmul tiles cleanly onto the MXU.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import he_normal, make_activation, zeros_init


def combine_interleaved(t: jnp.ndarray, inner_dims: Sequence[int] = (1,), agg_type: str = "average") -> jnp.ndarray:
    """Reduce a multiview inner axis (reference utils.py `combine_interleaved`).

    t: (N*inner, ..., C) -> (N, ..., C) reduced over the inner views.
    """
    if len(inner_dims) == 1 and inner_dims[0] == 1:
        return t
    t = t.reshape(-1, *inner_dims, *t.shape[1:])
    if agg_type == "average":
        return t.mean(axis=1)
    if agg_type == "max":
        return t.max(axis=1)
    raise NotImplementedError(f"combine_interleaved: {agg_type}")


class ResnetBlockFC(nn.Module):
    """Two-layer FC residual block; fc_1 zero-initialized so the block starts
    as identity (reference resnetfc.py:10-63 / layers.py:7-49).

    `dtype` selects the computation precision (params stay float32): pass
    jnp.bfloat16 to run the matmuls on the MXU at full rate.
    """

    size_out: int | None = None
    size_h: int | None = None
    beta: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        size_in = x.shape[-1]
        size_out = self.size_out or size_in
        size_h = self.size_h or min(size_in, size_out)
        actvn = make_activation(self.beta)

        net = nn.Dense(size_h, kernel_init=he_normal(), bias_init=zeros_init, dtype=self.dtype)(actvn(x))
        dx = nn.Dense(size_out, kernel_init=zeros_init, bias_init=zeros_init, dtype=self.dtype)(actvn(net))
        if size_in == size_out:
            x_s = x
        else:
            x_s = nn.Dense(size_out, use_bias=False, kernel_init=he_normal(), dtype=self.dtype)(x)
        return x_s + dx


class ResnetFC(nn.Module):
    """ResNet MLP with per-block latent injection.

    Input layout matches the reference forward (resnetfc.py:134-189):
    zx = concat(latent z (d_latent), positional input x (d_in)) on the last
    axis. The learnable scalar `alpha` gates the latent injection.
    """

    d_in: int
    d_out: int = 4
    n_blocks: int = 5
    d_latent: int = 0
    d_hidden: int = 128
    beta: float = 0.0
    combine_layer: int = 1000
    combine_type: str = "average"
    use_spade: bool = False
    use_layer_norm: bool = False
    alpha: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        zx: jnp.ndarray,
        combine_inner_dims: Sequence[int] = (1,),
        ret_last_feat: bool = False,
    ) -> jnp.ndarray:
        # profiler cut point parity: reference resnetfc.py:141 "resnetfc_infer"
        with jax.named_scope("resnetfc_infer"):
            return self._forward(zx, combine_inner_dims, ret_last_feat)

    def _forward(self, zx, combine_inner_dims, ret_last_feat):
        assert zx.shape[-1] == self.d_latent + self.d_in
        actvn = make_activation(self.beta)

        if self.d_latent > 0:
            z = zx[..., : self.d_latent]
            x = zx[..., self.d_latent :]
        else:
            z = None
            x = zx

        if self.d_in > 0:
            x = nn.Dense(self.d_hidden, kernel_init=he_normal(), bias_init=zeros_init,
                         dtype=self.dtype, name="lin_in")(x)
        else:
            x = jnp.zeros(zx.shape[:-1] + (self.d_hidden,), zx.dtype)

        alpha = self.param("alpha", lambda key: jnp.asarray(self.alpha, jnp.float32))

        n_lin_z = min(self.combine_layer, self.n_blocks)
        for blkid in range(self.n_blocks):
            if blkid == self.combine_layer:
                x = combine_interleaved(x, combine_inner_dims, self.combine_type)
                if z is not None:
                    z = combine_interleaved(z, combine_inner_dims, self.combine_type)

            if self.d_latent > 0 and blkid < self.combine_layer and blkid < n_lin_z:
                tz = nn.Dense(
                    self.d_hidden, kernel_init=he_normal(), bias_init=zeros_init,
                    dtype=self.dtype, name=f"lin_z_{blkid}",
                )(z)
                if self.use_spade:
                    sz = nn.Dense(
                        self.d_hidden, kernel_init=he_normal(), bias_init=zeros_init,
                        dtype=self.dtype, name=f"scale_z_{blkid}",
                    )(z)
                    x = sz * x + alpha * tz
                else:
                    x = x + alpha * tz

            with jax.named_scope("resblock"):  # reference resnetfc.py:55
                x = ResnetBlockFC(beta=self.beta, dtype=self.dtype, name=f"block_{blkid}")(x)
            if self.use_layer_norm:
                x = nn.LayerNorm(name=f"ln_{blkid}")(x)

        out = nn.Dense(self.d_out, kernel_init=he_normal(), bias_init=zeros_init,
                       dtype=self.dtype, name="lin_out")(actvn(x))
        # outputs are AT LEAST f32 (bf16 compute returns f32 for the loss
        # math) without downcasting f64 inputs (the trained-parity harness
        # runs the whole model in f64)
        out = out.astype(jnp.promote_types(jnp.float32, zx.dtype))
        if ret_last_feat:
            return jnp.concatenate([out, x], axis=-1)
        return out
