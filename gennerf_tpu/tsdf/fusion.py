"""Classic TSDF fusion of posed depth maps.

Reference: src/data/tsdf.py:320-440 (`TSDFFusion`). The per-frame masked
in-place updates become a pure `integrate` step over dense state, folded with
`lax.scan` over frames in `fuse_frames` — fixed shapes, one compiled program,
no host round-trips. The masked-update semantics are preserved exactly:

  * voxels in frustum, with valid depth, and dist < 1 (not far behind the
    surface) are "valid";
  * first touch (weight==0) copies dist; later touches *accumulate* dist but
    only where dist > -1 (near-surface band), matching the reference's
    mask2/mask3 logic; weights count near-surface touches;
  * `get_tsdf` divides accumulated sums by weights.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.projection import project_voxels
from .tsdf import TSDF


class FusionState(NamedTuple):
    """Dense fusion accumulators, flat over V = nx*ny*nz voxels."""

    tsdf: jnp.ndarray    # (V,) accumulated truncated distances (first-touch copy)
    weight: jnp.ndarray  # (V,) near-surface observation count
    color: Optional[jnp.ndarray] = None  # (3, V) accumulated colors
    label: Optional[jnp.ndarray] = None  # (V,) latest label (int32), -1 = none


def init_state(voxel_dim, color: bool = True, label: bool = False) -> FusionState:
    nx, ny, nz = voxel_dim
    V = nx * ny * nz
    return FusionState(
        tsdf=jnp.ones((V,), jnp.float32),
        weight=jnp.zeros((V,), jnp.float32),
        color=jnp.zeros((3, V), jnp.float32) if color else None,
        label=-jnp.ones((V,), jnp.int32) if label else None,
    )


def integrate(
    state: FusionState,
    voxel_dim,
    voxel_size: float,
    origin,
    trunc_margin: float,
    projection: jnp.ndarray,
    depth: jnp.ndarray,
    color: Optional[jnp.ndarray] = None,
    label: Optional[jnp.ndarray] = None,
) -> FusionState:
    """Accumulate one depth frame (reference `TSDFFusion.integrate`,
    tsdf.py:369-418).

    Args:
        projection: (3, 4) world->image.
        depth: (H, W); 0 = invalid.
        color: optional (3, H, W).
        label: optional (H, W) int.
    """
    H, W = depth.shape
    px, py, pz, in_view = project_voxels(
        voxel_dim, voxel_size, origin, projection[None], H, W
    )
    px, py, pz, in_view = px[0], py[0], pz[0], in_view[0]  # (V,)

    d = depth[py, px]  # gathered depth per voxel (clamped indices; masked below)
    valid = in_view & (d > 0)

    dist = jnp.clip((pz - d) / trunc_margin, min=-1.0)
    valid = valid & (dist < 1)  # drop voxels far behind the surface

    first_touch = state.weight == 0
    near_surface = dist > -1

    # weight==0: copy; weight>0 & near surface: accumulate
    tsdf = jnp.where(valid & first_touch, dist, state.tsdf)
    mask2 = valid & near_surface
    tsdf = jnp.where(mask2 & ~first_touch, tsdf + dist, tsdf)
    weight = state.weight + mask2.astype(state.weight.dtype)

    new_color = state.color
    if state.color is not None and color is not None:
        gathered = color[:, py, px]  # (3, V)
        new_color = state.color + jnp.where(mask2[None], gathered, 0.0)

    new_label = state.label
    if state.label is not None and label is not None:
        gathered = label[py, px].astype(jnp.int32)
        new_label = jnp.where(mask2, gathered, state.label)  # newest label wins

    return FusionState(tsdf=tsdf, weight=weight, color=new_color, label=new_label)


@partial(jax.jit, static_argnames=("voxel_dim", "voxel_size", "trunc_margin", "use_color", "use_label"))
def fuse_frames(
    voxel_dim,
    voxel_size: float,
    origin,
    trunc_margin: float,
    projections: jnp.ndarray,
    depths: jnp.ndarray,
    colors: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
    use_color: bool = False,
    use_label: bool = False,
) -> FusionState:
    """Fuse T frames in one compiled scan.

    Args:
        projections: (T, 3, 4).
        depths: (T, H, W).
        colors: optional (T, 3, H, W).
        labels: optional (T, H, W).
    """
    state = init_state(voxel_dim, color=use_color, label=use_label)
    xs = {"proj": projections, "depth": depths}
    if use_color:
        xs["color"] = colors
    if use_label:
        xs["label"] = labels

    def step(s, x):
        return (
            integrate(
                s, voxel_dim, voxel_size, origin, trunc_margin,
                x["proj"], x["depth"], x.get("color"), x.get("label"),
            ),
            None,
        )

    state, _ = jax.lax.scan(step, state, xs)
    return state


class TSDFFusion:
    """Stateful convenience wrapper mirroring the reference API
    (src/data/tsdf.py:320). Device work stays jit'd and functional under the
    hood; this class only carries the accumulator pytree between calls."""

    def __init__(
        self,
        voxel_dim=(128, 128, 128),
        voxel_size: float = 0.02,
        origin=(0.0, 0.0, 0.0),
        trunc_ratio: float = 3,
        color: bool = True,
        label: bool = False,
    ):
        self.voxel_dim = tuple(int(d) for d in voxel_dim)
        self.voxel_size = float(voxel_size)
        self.origin = jnp.asarray(origin, jnp.float32).reshape(1, 3)
        self.trunc_margin = self.voxel_size * trunc_ratio
        self.use_color = color
        self.use_label = label
        self.reset()

    def reset(self):
        self.state = init_state(self.voxel_dim, self.use_color, self.use_label)

    def integrate(self, projection, depth, color=None, label=None):
        self.state = _integrate_jit(
            self.state,
            self.voxel_dim,
            self.voxel_size,
            self.origin,
            self.trunc_margin,
            jnp.asarray(projection),
            jnp.asarray(depth),
            None if color is None else jnp.asarray(color),
            None if label is None else jnp.asarray(label),
        )

    def get_tsdf(self, label_name: str = "instance") -> TSDF:
        nx, ny, nz = self.voxel_dim
        touched = self.state.weight > 0
        tsdf_vol = jnp.where(touched, self.state.tsdf / jnp.maximum(self.state.weight, 1.0), self.state.tsdf)
        attribute_vols = {}
        if self.state.color is not None:
            color = jnp.where(
                touched[None], self.state.color / jnp.maximum(self.state.weight, 1.0)[None], self.state.color
            )
            attribute_vols["color"] = color.reshape(3, nx, ny, nz)
        if self.state.label is not None:
            attribute_vols[label_name] = self.state.label.reshape(nx, ny, nz)
        return TSDF(self.voxel_size, self.origin, tsdf_vol.reshape(nx, ny, nz), attribute_vols)


@partial(jax.jit, static_argnames=("voxel_dim", "voxel_size", "trunc_margin"))
def _integrate_jit(state, voxel_dim, voxel_size, origin, trunc_margin, projection, depth, color, label):
    return integrate(state, voxel_dim, voxel_size, origin, trunc_margin, projection, depth, color, label)


@partial(jax.jit, static_argnames=("voxel_dim", "voxel_size", "trunc_margin"))
def touched_mask(
    voxel_dim,
    voxel_size: float,
    origin,
    trunc_margin: float,
    projections: jnp.ndarray,
    depths: jnp.ndarray,
) -> jnp.ndarray:
    """(V,) bool: voxels the reference fusion would ever WRITE given these
    frames (reference tsdf.py:387-401: in frustum, valid depth pixel, and
    dist=(pz-d)/trunc < 1 i.e. not beyond the truncation band behind the
    surface). The complement is exactly the set where the fused GT is a
    deterministic +1 (the fusion init) regardless of scene content — see
    `apply_fusion_prior`.

    Args:
        projections: (T, 3, 4) world->image.
        depths: (T, H, W); 0 = invalid.
    """
    H, W = depths.shape[-2:]
    nx, ny, nz = voxel_dim
    V = nx * ny * nz

    def step(touched, frame):
        projection, depth = frame
        px, py, pz, in_view = project_voxels(
            voxel_dim, voxel_size, origin, projection[None], H, W
        )
        px, py, pz, in_view = px[0], py[0], pz[0], in_view[0]
        d = depth[py, px]
        valid = in_view & (d > 0) & ((pz - d) < trunc_margin)
        return touched | valid, None

    touched, _ = jax.lax.scan(step, jnp.zeros((V,), bool), (projections, depths))
    return touched


@partial(jax.jit, static_argnames=("voxel_dim", "voxel_size", "trunc_margin"))
def _prior_classes(voxel_dim, voxel_size, origin, trunc_margin, projections, depths):
    """(near_any, farfront_any): per-voxel bools over the frame set.

    near: some frame observes the voxel inside the truncation band
    (|pz - d| < trunc_margin) — fusion accumulates the model-relevant
    ramp there. farfront: some frame observes it more than trunc_margin
    IN FRONT of the measured surface (pz <= d - trunc_margin) — the
    clipped dist is exactly -1 for that frame.
    """
    H, W = depths.shape[-2:]
    nx, ny, nz = voxel_dim
    V = nx * ny * nz

    def step(carry, frame):
        near, farfront = carry
        projection, depth = frame
        px, py, pz, in_view = project_voxels(
            voxel_dim, voxel_size, origin, projection[None], H, W
        )
        px, py, pz, in_view = px[0], py[0], pz[0], in_view[0]
        d = depth[py, px]
        valid = in_view & (d > 0)
        near = near | (valid & (jnp.abs(pz - d) < trunc_margin))
        farfront = farfront | (valid & ((pz - d) <= -trunc_margin))
        return (near, farfront), None

    init = (jnp.zeros((V,), bool), jnp.zeros((V,), bool))
    (near, farfront), _ = jax.lax.scan(step, init, (projections, depths))
    return near, farfront


def apply_fusion_prior(
    tsdf_vol: jnp.ndarray,
    voxel_size: float,
    origin,
    projections: jnp.ndarray,
    depths: jnp.ndarray,
    trunc_ratio: float = 3.0,
) -> jnp.ndarray:
    """Replace the predicted dense TSDF wherever the fused GT of the input
    frames is a deterministic constant; keep the model's field in the
    near-surface band where reconstruction actually happens.

    Per the reference fusion semantics (tsdf.py:369-418; mirrored exactly
    by `integrate` above):

      * a voxel some frame observes inside the truncation band
        (|pz - d| < trunc) gets the accumulated ramp — model territory,
        prediction kept;
      * otherwise, if some valid frame sees it more than trunc IN FRONT of
        its measured surface, every such frame contributes the clipped
        dist -1 with zero near-surface weight, so the fused value is
        exactly -1 (free space the input rays provably traversed);
      * otherwise (out of every frustum, behind invalid pixels, or deeper
        than trunc behind every surface) fusion never writes it and the
        fused value is exactly the init +1.

    Both constants are functions of the (projection, depth) inputs the
    model already consumes — this is the inference-side analog of the
    reference's `volume[:, valid==0] = 0` feature masking
    (voxel_net.py:163-167), and it removes hallucinated surface the
    eval-side re-fusion trim cannot reach (it is visible from GT views).
    """
    voxel_dim = tuple(int(s) for s in tsdf_vol.shape)
    near, farfront = _prior_classes(
        voxel_dim, float(voxel_size), jnp.asarray(origin, jnp.float32).reshape(3),
        float(voxel_size) * trunc_ratio, projections, depths,
    )
    flat = tsdf_vol.reshape(-1)
    one = jnp.ones((), flat.dtype)
    return jnp.where(near, flat, jnp.where(farfront, -one, one)).reshape(voxel_dim)
