"""2D teacher models for semantic feature distillation.

The reference declares the teacher slot (`self.f_teacher = None  # TODO`,
src/models/model.py:32) and the `use_auxiliary` path that concatenates
teacher 2D features into the back-projected volume (model.py:111-113); the
intended pipeline distills a VLM (MaskCLIP/GeFF-style) into `e_sem`.

This module makes that interface concrete and self-contained:

  * `Teacher` protocol: images (B, 3, H, W) -> features (B, C, H', W').
  * `RandomProjectionTeacher`: a frozen, seeded random conv featurizer —
    parameter-free to train, deterministic across runs. A stand-in with the
    exact tensor contract of a real VLM backbone (swap in ported CLIP
    weights when available; no pretrained weights ship in this environment).
  * `sample_teacher_features`: pixel-aligned bilinear lookup used to build
    distillation targets at sampled surface points.
"""
from __future__ import annotations

from typing import Protocol

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interpolation import grid_sample_2d


class Teacher(Protocol):
    feature_dim: int

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray: ...


class RandomProjectionTeacher:
    """Frozen seeded conv featurizer: patchify + random projection + tanh.

    Output resolution is images/stride, matching the pixel-aligned teacher
    contract (features can be bilinearly sampled at any pixel).
    """

    def __init__(self, feature_dim: int = 64, patch: int = 8, stride: int = 4, seed: int = 0):
        self.feature_dim = feature_dim
        self.patch = patch
        self.stride = stride
        rng = np.random.default_rng(seed)
        w = rng.standard_normal((feature_dim, 3, patch, patch)).astype(np.float32)
        w /= np.sqrt(3 * patch * patch)
        self._filters = jnp.asarray(w)

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, 3, H, W) -> (B, C, H/stride, W/stride)."""
        dn = jax.lax.conv_dimension_numbers(
            images.shape, self._filters.shape, ("NCHW", "OIHW", "NCHW")
        )
        feats = jax.lax.conv_general_dilated(
            images, self._filters, (self.stride, self.stride),
            "SAME", dimension_numbers=dn,
        )
        return jnp.tanh(feats / 8.0)


def sample_teacher_features(
    feat_map: jnp.ndarray, h_idxs: jnp.ndarray, w_idxs: jnp.ndarray,
    image_hw,
) -> jnp.ndarray:
    """Bilinearly sample pixel-aligned teacher features at image pixels.

    Args:
        feat_map: (B, C, H', W') teacher features.
        h_idxs, w_idxs: (B, R) pixel coords in the original image grid.
        image_hw: (H, W) of the original images.

    Returns:
        (B, R, C).
    """
    H, W = image_hw
    # normalized [-1, 1] coords over the original image extent
    gx = 2.0 * w_idxs.astype(jnp.float32) / (W - 1) - 1.0
    gy = 2.0 * h_idxs.astype(jnp.float32) / (H - 1) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)[:, :, None, :]  # (B, R, 1, 2)
    out = grid_sample_2d(feat_map, grid)  # (B, C, R, 1)
    return out[..., 0].transpose(0, 2, 1)


def make_teacher(cfg) -> Teacher:
    """Factory over the teacher config surface."""
    t = getattr(cfg, "type", None) or (cfg.get("type") if isinstance(cfg, dict) else None)
    if t in (None, "none"):
        return None
    if t == "random_projection":
        get = (lambda k, d: getattr(cfg, k, d)) if not isinstance(cfg, dict) else (lambda k, d: cfg.get(k, d))
        return RandomProjectionTeacher(
            feature_dim=get("feature_dim", 64),
            patch=get("patch", 8),
            stride=get("stride", 4),
            seed=get("seed", 0),
        )
    raise NotImplementedError(f"teacher type {t}")
