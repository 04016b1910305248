"""2D U-Net used to smooth triplane features.

Reference: src/models/components/unet.py (jaxony/unet-pytorch port): per
level two 3x3 convs + ReLU, maxpool downs, transpose-conv (or upsample) ups,
concat or add merges, final 1x1 conv. Xavier-normal init (reference
`weight_init`, unet.py:210-213).

Layout: NCHW at the API boundary (matching the triplane tensors); internally
flax convs run NHWC — the natural TPU layout.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

xavier_normal = nn.initializers.xavier_normal
zeros_init = nn.initializers.zeros


class _DownConv(nn.Module):
    out_channels: int
    pooling: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # NHWC
        x = nn.relu(nn.Conv(self.out_channels, (3, 3), padding=1, kernel_init=xavier_normal(), bias_init=zeros_init, dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(self.out_channels, (3, 3), padding=1, kernel_init=xavier_normal(), bias_init=zeros_init, dtype=self.dtype)(x))
        before_pool = x
        if self.pooling:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x, before_pool


class _UpConv(nn.Module):
    out_channels: int
    merge_mode: str = "concat"
    up_mode: str = "transpose"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, from_down, from_up):  # NHWC
        if self.up_mode == "transpose":
            up = nn.ConvTranspose(
                self.out_channels, (2, 2), strides=(2, 2),
                kernel_init=xavier_normal(), bias_init=zeros_init,
                dtype=self.dtype,
            )(from_up)
        else:
            B, H, W, C = from_up.shape
            up = jnp.repeat(jnp.repeat(from_up, 2, axis=1), 2, axis=2)
            up = nn.Conv(self.out_channels, (1, 1), kernel_init=xavier_normal(), bias_init=zeros_init, dtype=self.dtype)(up)
        if self.merge_mode == "concat":
            x = jnp.concatenate([up, from_down], axis=-1)
        else:
            x = up + from_down
        x = nn.relu(nn.Conv(self.out_channels, (3, 3), padding=1, kernel_init=xavier_normal(), bias_init=zeros_init, dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(self.out_channels, (3, 3), padding=1, kernel_init=xavier_normal(), bias_init=zeros_init, dtype=self.dtype)(x))
        return x


class UNet(nn.Module):
    """U-Net over NCHW tensors (API parity with the reference module)."""

    num_classes: int
    depth: int = 5
    start_filts: int = 64
    up_mode: str = "transpose"
    merge_mode: str = "concat"
    # compute dtype (bf16-mixed); params stay f32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # NCHW -> NHWC
        x = x.transpose(0, 2, 3, 1)
        encoder_outs = []
        outs = self.start_filts
        for i in range(self.depth):
            outs = self.start_filts * (2**i)
            pooling = i < self.depth - 1
            x, before_pool = _DownConv(outs, pooling, dtype=self.dtype, name=f"down_{i}")(x)
            encoder_outs.append(before_pool)
        for i in range(self.depth - 1):
            outs = outs // 2
            before_pool = encoder_outs[-(i + 2)]
            x = _UpConv(outs, self.merge_mode, self.up_mode, dtype=self.dtype, name=f"up_{i}")(before_pool, x)
        x = nn.Conv(self.num_classes, (1, 1), kernel_init=xavier_normal(), bias_init=zeros_init, dtype=self.dtype, name="conv_final")(x)
        return x.transpose(0, 3, 1, 2)
