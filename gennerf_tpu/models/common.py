"""Shared model utilities: initializers, activations, norms.

Initializer parity notes (vs the torch reference):
  * `kaiming_normal_(a=0, mode='fan_in')`  -> nn.initializers.he_normal()
  * `xavier_uniform_(gain=calculate_gain('tanh'))` -> variance_scaling with
    the 5/3 tanh gain folded in.
  * zero-init residual second layers are explicit zeros.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import variance_scaling

he_normal = nn.initializers.he_normal
zeros_init = nn.initializers.zeros


def xavier_uniform_tanh():
    """torch.nn.init.xavier_uniform_ with gain=calculate_gain('tanh')=5/3.

    xavier_uniform draws U(-a, a) with a = gain*sqrt(6/(fan_in+fan_out)) —
    i.e. variance_scaling(scale=gain^2, fan_avg, uniform).
    """
    return variance_scaling((5.0 / 3.0) ** 2, "fan_avg", "uniform")


def make_activation(beta: float = 0.0) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """ReLU, or softplus(beta) when beta > 0 (reference resnetfc.py:43-46)."""
    if beta > 0:
        import jax

        return lambda x: jax.nn.softplus(beta * x) / beta
    return nn.relu


class Norm2d(nn.Module):
    """Normalization switch for NCHW tensors (reference utils.py:36-54).

    'batch'      — BatchNorm with running stats.
    'sync_batch' — BatchNorm synced over the data mesh axis (the SyncBN
                   equivalent: statistics are pmean'd over 'data').
    'instance'   — InstanceNorm, no affine, no running stats.
    'group'      — GroupNorm(32) (TPU-friendly alternative, no cross-device
                   sync needed).
    'none'       — identity.
    """

    norm_type: str = "batch"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: (B, C, H, W) — normalize over channel axis 1
        if self.norm_type in ("batch", "sync_batch"):
            return nn.BatchNorm(
                use_running_average=not train,
                axis=1,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.axis_name if self.norm_type == "sync_batch" else None,
            )(x)
        if self.norm_type == "instance":
            mean = x.mean(axis=(2, 3), keepdims=True)
            var = x.var(axis=(2, 3), keepdims=True)
            return (x - mean) / jnp.sqrt(var + 1e-5)
        if self.norm_type == "group":
            return nn.GroupNorm(num_groups=32, epsilon=1e-5)(
                x.transpose(0, 2, 3, 1)
            ).transpose(0, 3, 1, 2)
        if self.norm_type == "none":
            return x
        raise ValueError(self.norm_type)
