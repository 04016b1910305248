"""Evaluation metrics: TSDF L1, mesh precision/recall/F-score, depth metrics.

Reference: src/models/metrics.py. Mesh metrics use the native C++ KD-tree
(replacing Open3D); all metrics are host-side numpy (eval-only, like the
reference).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def eval_tsdf(tsdf_pred, tsdf_trgt, align: bool = False) -> Dict[str, float]:
    """Masked TSDF L1 (reference metrics.py:24-78): only voxels where the
    target is observed (trgt < 1) count.

    The reference assumes pred and target share one grid (its predict
    always decodes the GT volume's grid). Here prediction may be sized
    from `voxel_dim_test` instead (GT-less predict), so when the GRIDS
    differ (shape, origin, or voxel size) and both sides are TSDF
    objects, the prediction is resampled at the TARGET's voxel centers in
    world space (trilinear, out-of-bounds → 1.0 = unobserved) before
    comparing.

    Same-shape grids compare voxel-to-voxel BY DEFAULT even though decoded
    volumes live on the linspace convention and fused GT on arange — a
    sub-voxel misregistration growing to ~1 voxel at the far boundary.
    This intentionally preserves the reference's own biased compare
    (its predict_tsdf queries the same linspace grid and its eval_tsdf
    subtracts directly, metrics.py:63-78), so L1 numbers are
    reference-comparable. Pass `align=True` to apply the world-aligned
    resample regardless, making same-shape and cross-shape evals of one
    model mutually comparable instead."""
    pred = np.asarray(tsdf_pred.tsdf_vol if hasattr(tsdf_pred, "tsdf_vol") else tsdf_pred)
    trgt = np.asarray(tsdf_trgt.tsdf_vol if hasattr(tsdf_trgt, "tsdf_vol") else tsdf_trgt)
    have_grids = hasattr(tsdf_pred, "origin") and hasattr(tsdf_trgt, "origin")
    grids_differ = pred.shape != trgt.shape or (
        have_grids
        and (
            not np.allclose(
                np.asarray(tsdf_pred.origin).reshape(3),
                np.asarray(tsdf_trgt.origin).reshape(3),
                atol=1e-6,
            )
            or abs(float(tsdf_pred.voxel_size) - float(tsdf_trgt.voxel_size)) > 1e-9
        )
    )
    if grids_differ or (align and have_grids):
        if not have_grids:
            raise ValueError(
                f"pred {pred.shape} vs target {trgt.shape}: raw arrays of "
                "different shapes cannot be aligned (pass TSDF objects)"
            )
        pred = _resample_tsdf_to(tsdf_pred, tsdf_trgt)
    mask = trgt < 1
    if mask.sum() == 0:
        return {"l1": 0.0}
    return {"l1": float(np.abs(pred[mask] - trgt[mask]).mean())}


def _resample_tsdf_to(tsdf_pred, tsdf_trgt, pred_convention: str = "linspace") -> np.ndarray:
    """Trilinearly sample pred's volume at trgt's voxel centers (world
    aligned); outside pred's volume the value is 1.0 (unobserved),
    matching the target's own convention.

    `pred_convention`: where pred's samples actually live. Decoded volumes
    (the only cross-grid producers here) query the reference's
    `linspace(0, voxel_size*n, n)` grid — per-axis spacing
    voxel_size*n/(n-1), NOT voxel_size (reference utils.py:926-935;
    ops/coords.grid_coordinates) — while fused GT volumes use
    `arange*voxel_size`. Using the true spacing avoids a misregistration
    growing to one full voxel at the far boundary."""
    pred = np.asarray(tsdf_pred.tsdf_vol, np.float32)
    po = np.asarray(tsdf_pred.origin, np.float32).reshape(3)
    pvs = float(tsdf_pred.voxel_size)
    to = np.asarray(tsdf_trgt.origin, np.float32).reshape(3)
    tvs = float(tsdf_trgt.voxel_size)
    tshape = np.asarray(tsdf_trgt.tsdf_vol).shape
    if pred_convention == "linspace":
        spacing = [pvs * n / max(n - 1, 1) for n in pred.shape]
    else:
        spacing = [pvs] * 3

    axes = [to[a] + tvs * np.arange(tshape[a], dtype=np.float32) for a in range(3)]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    # continuous voxel coords in pred's grid
    coords = [(g - po[a]) / spacing[a] for a, g in enumerate((gx, gy, gz))]
    out = np.ones(tshape, np.float32)
    lo = [np.floor(c).astype(np.int64) for c in coords]
    fr = [c - l for c, l in zip(coords, lo)]
    inb = np.ones(tshape, bool)
    for a, c in enumerate(coords):
        # a coordinate exactly on the last voxel plane is in bounds
        # (fr == 0 there makes the interpolation exact)
        inb &= (c >= 0) & (c <= pred.shape[a] - 1 + 1e-6)
    li = [np.clip(l, 0, pred.shape[a] - 1) for a, l in enumerate(lo)]
    hi = [np.clip(l + 1, 0, pred.shape[a] - 1) for a, l in enumerate(lo)]
    acc = np.zeros(tshape, np.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (fr[0] if dx else 1 - fr[0])
                    * (fr[1] if dy else 1 - fr[1])
                    * (fr[2] if dz else 1 - fr[2])
                )
                acc += w * pred[
                    hi[0] if dx else li[0],
                    hi[1] if dy else li[1],
                    hi[2] if dz else li[2],
                ]
    out[inb] = acc[inb]
    return out


def _nn_distances(queries: np.ndarray, targets: np.ndarray) -> np.ndarray:
    try:
        from ..native import nn_distances

        return nn_distances(queries, targets)
    except Exception:
        from scipy.spatial import cKDTree

        return cKDTree(targets).query(queries)[0]


def _sample_surface(mesh, voxel: float = 0.02) -> np.ndarray:
    """Voxel-hash downsample of mesh vertices at `voxel` meters — one point
    (the centroid) per occupied voxel, matching the reference's Open3D
    `voxel_down_sample(0.02)` (metrics.py:137-144). Unlike uniform vertex
    subsampling, this is unbiased on non-uniformly tessellated meshes."""
    verts = np.asarray(mesh.vertices, np.float32)
    if len(verts) == 0:
        return verts
    cells = np.floor(verts / voxel).astype(np.int64)
    _, inv, counts = np.unique(cells, axis=0, return_inverse=True, return_counts=True)
    sums = np.zeros((len(counts), 3), np.float64)
    np.add.at(sums, inv, verts)
    return (sums / counts[:, None]).astype(np.float32)


def eval_mesh(mesh_pred, mesh_trgt, threshold: float = 0.05, down_sample: float = 0.02) -> Dict[str, float]:
    """Mesh precision/recall/F-score at `threshold` meters
    (reference metrics.py:81-146); vertices voxel-downsampled at
    `down_sample` meters first (reference uses 2 cm).

    prec  = fraction of predicted points within threshold of target,
    recal = fraction of target points within threshold of prediction,
    dist1 = mean pred->target distance, dist2 = mean target->pred.
    """
    pts_pred = _sample_surface(mesh_pred, down_sample)
    pts_trgt = _sample_surface(mesh_trgt, down_sample)
    if len(pts_pred) == 0 or len(pts_trgt) == 0:
        return {"dist1": np.inf, "dist2": np.inf, "prec": 0.0, "recal": 0.0, "fscore": 0.0}

    d1 = _nn_distances(pts_pred, pts_trgt)  # pred -> target
    d2 = _nn_distances(pts_trgt, pts_pred)  # target -> pred
    precision = float((d1 < threshold).mean())
    recall = float((d2 < threshold).mean())
    fscore = 2 * precision * recall / max(precision + recall, 1e-12)
    return {
        "dist1": float(d1.mean()),
        "dist2": float(d2.mean()),
        "prec": precision,
        "recal": recall,
        "fscore": float(fscore),
    }


def eval_depth(depth_pred: np.ndarray, depth_trgt: np.ndarray) -> Dict[str, float]:
    """2D depth metrics (reference metrics.py:149-185): AbsRel/AbsDiff/SqRel/
    RMSE/LogRMSE/delta<1.25^n/completeness over pixels valid in both."""
    mask1 = depth_pred > 0
    mask = (depth_trgt > 0) & mask1
    if mask.sum() == 0:
        return {k: 0.0 for k in
                ["AbsRel", "AbsDiff", "SqRel", "RMSE", "LogRMSE", "r1", "r2", "r3", "complete"]}

    pred = depth_pred[mask]
    trgt = depth_trgt[mask]
    abs_diff = np.abs(pred - trgt)
    abs_rel = abs_diff / trgt
    sq_diff = abs_diff**2
    sq_rel = sq_diff / trgt
    sq_log_diff = (np.log(pred) - np.log(trgt)) ** 2
    thresh = np.maximum(pred / trgt, trgt / pred)
    r1 = (thresh < 1.25).astype(np.float64)
    r2 = (thresh < 1.25**2).astype(np.float64)
    r3 = (thresh < 1.25**3).astype(np.float64)

    return {
        "AbsRel": float(abs_rel.mean()),
        "AbsDiff": float(abs_diff.mean()),
        "SqRel": float(sq_rel.mean()),
        "RMSE": float(np.sqrt(sq_diff.mean())),
        "LogRMSE": float(np.sqrt(sq_log_diff.mean())),
        "r1": float(r1.mean()),
        "r2": float(r2.mean()),
        "r3": float(r3.mean()),
        "complete": float(mask1.mean()),
    }
