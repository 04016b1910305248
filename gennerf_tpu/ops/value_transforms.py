"""Scalar value transforms and image smoothing.

Reference: src/models/utils.py:205-268 (`log_transform`,
`smooth_log_transform`, `gaussian_kernel`, `apply_gaussian_smoothing`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def log_transform(x: jnp.ndarray, shift: float = 1.0) -> jnp.ndarray:
    """sign(x) * log(1 + |x|/shift): weights voxels near the surface more."""
    return jnp.sign(x) * jnp.log1p(jnp.abs(x) / shift)


def smooth_log_transform(x: jnp.ndarray, shift: float = 1.0, beta: float = 1.0) -> jnp.ndarray:
    """Differentiable log-like rescaling: tanh(x) * softplus(|x|/shift; beta).

    torch softplus(v, beta) = log(1 + exp(beta*v)) / beta.
    """
    v = jnp.abs(x) / shift
    return jnp.tanh(x) * jax.nn.softplus(beta * v) / beta


def gaussian_kernel_1d(kernel_size: int, sigma: float) -> jnp.ndarray:
    """Normalized 1D Gaussian of odd-or-even `kernel_size` taps, matching the
    reference's linspace(-(k//2), k//2, k) grid (utils.py:230-242)."""
    x = jnp.linspace(-(kernel_size // 2), kernel_size // 2, kernel_size)
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return g / g.sum()


def apply_gaussian_smoothing(image: jnp.ndarray, kernel_size: int, sigma: float) -> jnp.ndarray:
    """Depthwise Gaussian blur of (B, C, H, W), 'same' padding.

    The 2D kernel is separable; run two 1D convs (cheaper on the VPU and lets
    XLA fuse) — numerically identical to the reference's outer-product conv2d.
    """
    B, C, H, W = image.shape
    g = gaussian_kernel_1d(kernel_size, sigma).astype(image.dtype)
    pad = kernel_size // 2
    x = image.reshape(B * C, 1, H, W)
    kh = g.reshape(1, 1, kernel_size, 1)
    kw = g.reshape(1, 1, 1, kernel_size)
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn)
    return x.reshape(B, C, H, W)
