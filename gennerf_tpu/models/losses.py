"""GenNerf loss terms.

Reference: src/models/model.py:331-470. Pure functions of (cfg, outputs,
targets) returning per-element loss matrices plus the aggregated dict, so
the whole loss is one fused XLA program inside the train step.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.value_transforms import log_transform, smooth_log_transform
from .config import LossConfig


def _safe_norm(x, axis=-1, keepdims=False):
    """L2 norm whose gradient at a zero vector is 0 (torch's convention).

    jnp.linalg.norm's vjp at 0 is 0/0 -> NaN, and a NaN cotangent poisons
    the params through ANY gated/masked loss — jnp.where zeroes the
    forward value, not the backward path. This is not hypothetical: with
    use_eikonal=true the zero-initialized heads make grad-TSDF exactly 0
    at EVERY sample on step 0, so the very first update NaN'd the whole
    model (caught by tests/test_train_e2e.py::TestEikonalTraining).
    Forward value is bit-identical to jnp.linalg.norm."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    safe = jnp.where(sq > 0, sq, 1.0)
    return jnp.where(sq > 0, jnp.sqrt(safe), 0.0)


def loss_tsdf(cfg: LossConfig, outputs, targets) -> jnp.ndarray:
    """L1 on (optionally log-rescaled) TSDF (reference model.py:331-358)."""
    pred = outputs["tsdf"]
    trgt = targets["tsdf"]
    t = cfg.tsdf
    if t.transform == "log":
        pred = log_transform(pred, t.shift)
        trgt = log_transform(trgt, t.shift)
    elif t.transform == "smooth_log":
        pred = smooth_log_transform(pred, t.shift, t.smoothness)
        trgt = smooth_log_transform(trgt, t.shift, t.smoothness)
    elif t.transform != "none":
        raise NotImplementedError(f"tsdf transform {t.transform}")
    return jnp.abs(pred - trgt)


def loss_isdf(cfg: LossConfig, outputs, targets) -> jnp.ndarray:
    """iSDF combined free-space/near-surface loss (model.py:360-383;
    arXiv:2204.02296).

    Parity note: like the reference, this receives the trilinearly-sampled
    FUSED-TSDF target (clamped to [-1, 1]; reference model.py:665 — the
    iSDF ray-bounds alternative is commented out at model.py:666), so the
    `trgt <= 1.0` gate below is satisfied everywhere and the free-space
    branch never engages; the loss degenerates to trunc_weight * L1
    exactly as the reference's does. Kept bit-faithful (the torch-oracle
    parity tests pin every loss term); feed unclamped iSDF bounds as
    targets['tsdf'] to activate the free-space term as the iSDF paper
    intends."""
    pred = outputs["tsdf"]
    trgt = targets["tsdf"]
    c = cfg.isdf
    term1 = jnp.exp(-c.free_space_factor * pred) - 1.0
    term2 = pred - trgt
    loss_free = jnp.maximum(jax.nn.relu(term1), term2)
    loss_near = jnp.abs(pred - trgt) * c.trunc_weight
    mask = (trgt <= 1.0).astype(pred.dtype)
    return mask * loss_near + (1 - mask) * loss_free


def loss_eikonal(cfg: LossConfig, outputs, targets) -> jnp.ndarray:
    """Unit-gradient-norm regularizer (model.py:385-397; arXiv:2002.10099).

    Parity note: the gate zeroes the term where the FUSED target (negative
    in observed free space, reference fusion convention) is below
    apply_distance — i.e. the regularizer acts only on samples at/behind
    the surface ramp, including the clamp-saturated +1 region. This
    mirrors the reference's `loss[tsdf < dist] = 0` on the same targets
    (its own TODO at model.py:396 flags the missing upper gate); kept
    bit-faithful for the torch-oracle parity tests."""
    tsdf = targets["tsdf"]  # (B, N, 1)
    grad = outputs["grad"]  # (B, N, 3)
    gnorm = _safe_norm(grad, axis=-1)
    loss = jnp.abs(gnorm - 1.0)[..., None]
    return jnp.where(tsdf < cfg.eikonal.apply_distance, 0.0, loss)


def loss_gradient(cfg: LossConfig, outputs, targets, num_rays: int) -> jnp.ndarray:
    """Cosine distance between predicted TSDF gradients and geometric
    normals / ray-bound gradients (model.py:399-423)."""
    sampled_normals = targets["sampled_normals"]  # (B, R, 3)
    grad_vec = targets["grad_vec"]  # (B, R, N+M, 3)
    B = sampled_normals.shape[0]
    grad = outputs["grad"].reshape(B, num_rays, -1, 3)  # (B, R, 1+N+M, 3)

    def cos(a, b):
        num = (a * b).sum(-1)
        den = jnp.maximum(_safe_norm(a, axis=-1) * _safe_norm(b, axis=-1), 1e-6)
        return num / den

    surf_loss = 1.0 - cos(sampled_normals, grad[:, :, 0])  # (B, R)
    # replace NaN bound-gradients (sample == surface point) with the normal
    nan_mask = jnp.isnan(grad_vec[..., :1])
    grad_vec = jnp.where(nan_mask, sampled_normals[:, :, None], grad_vec)
    grad_loss = 1.0 - cos(grad_vec, grad[:, :, 1:])  # (B, R, N+M)
    loss = jnp.concatenate([surf_loss[:, :, None], grad_loss], axis=2)
    return loss.reshape(B, -1, 1)


def loss_feat(cfg: LossConfig, outputs, targets) -> jnp.ndarray:
    """Encourage non-degenerate encoder features (model.py:426-430)."""
    feat = outputs["feat"]
    contribution = _safe_norm(feat, axis=-1).mean()
    return 1.0 / jnp.maximum(contribution, 1e-12)


def loss_distill(cfg: LossConfig, outputs, targets) -> jnp.ndarray:
    """Distill e_sem toward teacher features at surface samples (the
    concrete version of the reference's intended VLM path, model.py:32).

    targets['teacher_feat'] (B, R, C) vs outputs['feat_sem_surface'] (B, R, C);
    masked by targets['teacher_mask'] (B, R, 1) when present.
    """
    pred = outputs["feat_sem_surface"]
    trgt = targets["teacher_feat"]
    if cfg.distill.metric == "cosine":
        num = (pred * trgt).sum(-1, keepdims=True)
        den = jnp.maximum(
            _safe_norm(pred, axis=-1, keepdims=True)
            * _safe_norm(trgt, axis=-1, keepdims=True),
            1e-6,
        )
        loss = 1.0 - num / den
    elif cfg.distill.metric == "l2":
        loss = ((pred - trgt) ** 2).mean(-1, keepdims=True)
    else:
        raise NotImplementedError(cfg.distill.metric)
    mask = targets.get("teacher_mask")
    if mask is not None:
        loss = loss * mask
    return loss


def _masked_mean(m: jnp.ndarray, valid) -> jnp.ndarray:
    """Mean over valid samples only. `valid` is (B, N, 1) in {0,1} or None."""
    if valid is None:
        return m.mean()
    # per-element losses are (B, N, 1); broadcast the mask over trailing dims
    w = jnp.broadcast_to(valid, m.shape)
    return (m * w).sum() / jnp.maximum(w.sum(), 1.0)


def calculate_loss(
    cfg: LossConfig, outputs, targets, num_rays: int = 0
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted sum of enabled terms (reference model.py:432-470).

    If targets['valid'] is present ((B, N, 1) float mask), all point-wise
    terms are averaged over valid samples only, so the loss is invariant to
    backfilled samples from frames with too few valid depth pixels (the
    reference raised in that case, utils.py:356-363; here the fixed-shape
    sampler backfills and we mask instead).

    Returns:
        (scalar combined loss, dict of per-term scalar means incl 'combined').
    """
    assert cfg.use_tsdf or cfg.use_isdf
    # mixed-precision policy: all loss math runs f32 even when the decoder
    # computed bf16 outputs (trainer.precision=bf16-mixed)
    outputs = {
        k: v.astype(jnp.float32) if hasattr(v, "astype") else v
        for k, v in outputs.items()
    }
    targets = {
        k: v.astype(jnp.float32)
        if hasattr(v, "astype") and jnp.issubdtype(v.dtype, jnp.floating)
        else v
        for k, v in targets.items()
    }
    valid = targets.get("valid")
    losses: Dict[str, jnp.ndarray] = {}
    loss_mat = 0.0
    loss_scalar = 0.0
    if cfg.use_tsdf:
        m = loss_tsdf(cfg, outputs, targets)
        losses["tsdf"] = _masked_mean(m, valid)
        loss_mat = loss_mat + cfg.tsdf.weight * m
    if cfg.use_isdf:
        m = loss_isdf(cfg, outputs, targets)
        losses["isdf"] = _masked_mean(m, valid)
        loss_mat = loss_mat + cfg.isdf.weight * m
    if cfg.use_eikonal:
        m = loss_eikonal(cfg, outputs, targets)
        losses["eikonal"] = _masked_mean(m, valid)
        loss_mat = loss_mat + cfg.eikonal.weight * m
    if cfg.use_gradient:
        m = loss_gradient(cfg, outputs, targets, num_rays)
        losses["gradient"] = _masked_mean(m, valid)
        loss_mat = loss_mat + cfg.gradient.weight * m
    if cfg.use_feature:
        m = loss_feat(cfg, outputs, targets)
        losses["feature"] = m.mean()
        loss_scalar = loss_scalar + cfg.feature.weight * m
    if cfg.use_distill and "teacher_feat" in targets:
        m = loss_distill(cfg, outputs, targets)
        # already zero-masked by teacher_mask; normalize by the valid count
        tm = targets.get("teacher_mask")
        d = m.sum() / jnp.maximum(jnp.broadcast_to(tm, m.shape).sum(), 1.0) if tm is not None else m.mean()
        losses["distill"] = d
        if tm is not None:
            # in-band dead-signal detector: a masked term whose support
            # fraction is 0 logs loss 0.0, indistinguishable from
            # 'perfectly distilled' (a 60-epoch drive trained on nothing
            # for 59 epochs before this scalar existed). The train loop
            # warns when this stays 0 through an epoch.
            losses["distill_coverage"] = tm.mean()
        # separate sample set from the main loss matrix -> add its mean
        loss_scalar = loss_scalar + cfg.distill.weight * d
    combined = (
        _masked_mean(loss_mat, valid) if hasattr(loss_mat, "mean") else loss_mat
    ) + loss_scalar
    if valid is not None:
        losses["valid_coverage"] = valid.mean()
    losses["combined"] = combined
    return combined, losses
