"""torchvision-style ResNet backbones (18/34/50) in flax.

Provides the 2D feature pyramid for the spatial encoder
(reference src/models/components/spatial_encoder.py uses torchvision
ResNets; here the same topology is built natively, with an optional
weight-port path from torchvision checkpoints in utils/port_torch.py).

Layout: NHWC internally (TPU-native); the spatial encoder handles NCHW
boundaries.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    norm_type: str = "batch"
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        def norm(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                axis_name=self.axis_name if self.norm_type == "sync_batch" else None,
                # mixed-precision policy: statistics/params stay f32 (flax
                # computes norm stats in f32 internally), but the RETURN
                # dtype follows the module — a jnp.float32 return here
                # silently upcast the whole residual stream, doubling every
                # activation (the T=8 spatial step's f32 640x480 stage maps)
                dtype=self.dtype, param_dtype=jnp.float32, name=name,
            )

        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = norm("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = norm("bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride, use_bias=False, dtype=self.dtype, name="down_conv")(x)
            identity = norm("down_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    norm_type: str = "batch"
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        def norm(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                axis_name=self.axis_name if self.norm_type == "sync_batch" else None,
                # mixed-precision policy: statistics/params stay f32 (flax
                # computes norm stats in f32 internally), but the RETURN
                # dtype follows the module — a jnp.float32 return here
                # silently upcast the whole residual stream, doubling every
                # activation (the T=8 spatial step's f32 640x480 stage maps)
                dtype=self.dtype, param_dtype=jnp.float32, name=name,
            )

        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(norm("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1, use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = nn.relu(norm("bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = norm("bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1), strides=self.stride, use_bias=False, dtype=self.dtype, name="down_conv")(x)
            identity = norm("down_bn")(identity)
        return nn.relu(out + identity)


RESNET_SPECS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
}


class ResNetStages(nn.Module):
    """The stem + 4 stages of a ResNet, returning intermediate features.

    `num_stages` controls how deep to build/run (the spatial encoder only
    needs the first `num_layers` stages; reference spatial_encoder.py:146-162).
    """

    backbone: str = "resnet34"
    num_stages: int = 4  # 0..4 residual stages after the stem
    use_first_pool: bool = True
    norm_type: str = "batch"
    axis_name: Optional[str] = None
    # compute dtype for convs AND the activation stream (mixed precision:
    # norm statistics/params stay f32; returns follow this dtype)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        """x: (B, H, W, 3) NHWC. Returns list of NHWC feature maps:
        [stem, stage1, ..., stage_num_stages]."""
        block_cls, layer_counts = RESNET_SPECS[self.backbone]

        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.axis_name if self.norm_type == "sync_batch" else None,
            dtype=self.dtype, param_dtype=jnp.float32, name="bn1",
        )(x)
        x = nn.relu(x)
        feats = [x]

        planes = 64
        for stage in range(self.num_stages):
            if stage == 0 and self.use_first_pool:
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            count = layer_counts[stage]
            stride = 1 if stage == 0 else 2
            for b in range(count):
                s = stride if b == 0 else 1
                needs_down = b == 0 and (s != 1 or x.shape[-1] != planes * block_cls.expansion)
                x = block_cls(
                    planes, stride=s, downsample=needs_down,
                    norm_type=self.norm_type, axis_name=self.axis_name,
                    dtype=self.dtype, name=f"layer{stage + 1}_{b}",
                )(x, train=train)
            feats.append(x)
            planes *= 2
        return feats
