"""TSDF data structure: save/load (reference-npz-compatible), resampling
transform, and mesh extraction.

Reference: src/data/tsdf.py:71-316. Device work (the grid-sample resample) is
jit'd JAX; marching cubes stays a host-side step (skimage), exactly like the
reference — it is an offline/eval operation, never in the training loop.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from ..ops.coords import coordinates
from ..ops.interpolation import grid_sample_3d


@partial(jax.jit, static_argnames=("voxel_dim", "old_dim", "voxel_size", "align_corners"))
def _transform_sample_grid(transform, origin, old_origin, voxel_dim, old_dim,
                           voxel_size, align_corners):
    """Sample coordinates (1, V, 3) + out-of-bounds mask for a rigid
    world-frame transform resample (jit: the host pipeline calls this per
    item — eager dispatch of the ~300 ops costs ~10x the compute)."""
    coords = coordinates(voxel_dim).astype(jnp.float32)  # (3, V)
    world = coords * voxel_size + origin.T
    world = jnp.concatenate([world, jnp.ones_like(world[:1])], axis=0)
    world = transform[:3] @ world
    grid = (world - old_origin.T) / voxel_size  # voxel coords in old frame
    dims = jnp.array(old_dim, dtype=jnp.float32).reshape(3, 1)
    norm = 2.0 * grid / (dims - 1.0) - 1.0
    sample = jnp.stack([norm[2], norm[1], norm[0]], axis=-1)[None]  # (1, V, 3)
    oob = (jnp.abs(norm) >= 1).any(axis=0)
    return sample, oob


@partial(jax.jit, static_argnames=("mode", "align_corners"))
def _resample(vol_in, sample, mode, align_corners):
    return grid_sample_3d(vol_in, sample, mode=mode,
                          align_corners=align_corners, padding_mode="zeros")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TSDF:
    """A truncated signed distance volume plus interpretation metadata.

    Attributes:
        voxel_size: metric voxel size (static / aux data).
        origin: (1, 3) world position of voxel (0, 0, 0).
        tsdf_vol: (nx, ny, nz) values in [-1, 1].
        attribute_vols: dict of extra per-voxel volumes (e.g. 'color' (3,nx,ny,nz),
            'semseg'/'instance' (nx,ny,nz)).
        attributes: dict of non-volume extras.
    """

    voxel_size: float
    origin: jnp.ndarray
    tsdf_vol: jnp.ndarray
    attribute_vols: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)
    attributes: Dict[str, Any] = dataclasses.field(default_factory=dict)

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        children = (self.origin, self.tsdf_vol, self.attribute_vols)
        aux = (self.voxel_size, tuple(sorted(self.attributes.items())))
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        origin, tsdf_vol, attribute_vols = children
        voxel_size, attr_items = aux
        return cls(voxel_size, origin, tsdf_vol, dict(attribute_vols), dict(attr_items))

    # -- io (host) ------------------------------------------------------------
    def save(self, fname: str) -> None:
        """npz layout identical to the reference (tsdf.py:107-117) so GT
        volumes interchange between frameworks."""
        def portable(x):
            # bf16 (model compute dtype) round-trips through npz as raw
            # void bytes numpy can't reload — store f32 like the reference
            a = np.asarray(x)
            return a.astype(np.float32) if a.dtype.kind == "V" or a.dtype == jnp.bfloat16 else a

        data = {
            "origin": portable(self.origin),
            "voxel_size": self.voxel_size,
            "tsdf": portable(self.tsdf_vol),
        }
        for key, value in self.attribute_vols.items():
            data[key] = portable(value)
        for key, value in self.attributes.items():
            data[key] = portable(value)
        np.savez_compressed(fname, **data)

    @classmethod
    def load(cls, fname: str, voxel_types: Optional[list] = None) -> "TSDF":
        with np.load(fname) as data:
            voxel_size = float(data["voxel_size"])
            origin = jnp.asarray(data["origin"]).reshape(1, 3)
            tsdf_vol = jnp.asarray(data["tsdf"])
            attribute_vols = {}
            if "color" in data and (voxel_types is None or "color" in voxel_types):
                attribute_vols["color"] = jnp.asarray(data["color"])
            if "instance" in data and (
                voxel_types is None
                or "instance" in voxel_types
                or "semseg" in voxel_types
            ):
                attribute_vols["instance"] = jnp.asarray(data["instance"])
        return cls(voxel_size, origin, tsdf_vol, attribute_vols)

    # -- device ops -----------------------------------------------------------
    def transform(
        self,
        transform: Optional[jnp.ndarray] = None,
        voxel_dim: Optional[tuple] = None,
        origin: Optional[jnp.ndarray] = None,
        align_corners: bool = False,
    ) -> "TSDF":
        """Resample the volume under a rigid transform of the world frame.

        Parity with reference TSDF.transform (tsdf.py:233-316): nearest
        resample along the ±1 (unknown/empty) plateau, bilinear near the
        surface, out-of-bounds voxels forced to 1 (empty).
        """
        old_dim = list(self.tsdf_vol.shape)
        old_origin = self.origin.reshape(1, 3)
        if transform is None:
            transform = jnp.eye(4, dtype=self.tsdf_vol.dtype)
        if voxel_dim is None:
            voxel_dim = old_dim
        if origin is None:
            origin = old_origin
        else:
            origin = jnp.asarray(origin, dtype=jnp.float32).reshape(1, 3)

        # normalized sample coords in [-1, 1]; grid_sample axis convention:
        # coord 0 -> last input axis. Input below is (1, 1, nx, ny, nz), so
        # coord order must be (z, y, x). NOTE reference quirk preserved
        # (tsdf.py:287-292): the normalization always uses the (dim-1)
        # align_corners=True formula, while sampling defaults to
        # align_corners=False — a deliberate half-voxel offset we replicate.
        sample, oob = _transform_sample_grid(
            transform, origin, old_origin, tuple(voxel_dim), tuple(old_dim),
            float(self.voxel_size), align_corners,
        )

        vol_in = self.tsdf_vol[None, None]  # (1, 1, nx, ny, nz)
        # padding_mode='zeros' (torch default in the reference call); the oob
        # mask below overwrites boundary voxels with 1 anyway
        near = _resample(vol_in, sample, "nearest", align_corners)[0, 0]
        bilin = _resample(vol_in, sample, "bilinear", align_corners)[0, 0]
        vol = jnp.where(jnp.abs(near) < 1, bilin, near)
        vol = jnp.where(oob, 1.0, vol)
        vol = vol.reshape(voxel_dim)

        attribute_vols = {}
        for key, value in self.attribute_vols.items():
            if value.ndim == 3:
                v_in = value[None, None].astype(jnp.float32)
            else:
                v_in = value[None].astype(jnp.float32)
            mode = "bilinear" if jnp.issubdtype(value.dtype, jnp.floating) else "nearest"
            out = _resample(v_in, sample, mode, align_corners)[0]
            out = out.reshape((-1,) + tuple(voxel_dim)).astype(value.dtype)
            if value.ndim == 3:
                out = out[0]
            if key == "mask_outside":
                out = jnp.where(oob.reshape(voxel_dim), True, out)
            elif key == "semseg":
                out = jnp.where(oob.reshape(voxel_dim), -1, out)
            attribute_vols[key] = out

        return TSDF(self.voxel_size, origin, vol, attribute_vols, dict(self.attributes))

    # -- host mesh extraction ---------------------------------------------------
    def get_mesh(self, attribute: str = "color", cmap: str = "nyu40"):
        """Marching-cubes mesh extraction (host-side; reference tsdf.py:158-230)."""
        from ..utils.mesh import Mesh

        tsdf_vol = -np.asarray(self.tsdf_vol)  # MC wants positive outside
        # don't close surfaces along the unknown-empty boundary
        tsdf_vol[tsdf_vol == -1] = 1
        tsdf_vol = np.clip(tsdf_vol, -1, 1)

        if tsdf_vol.min() >= 0 or tsdf_vol.max() <= 0:
            return Mesh(vertices=np.zeros((0, 3)))

        verts, faces = _marching_cubes(tsdf_vol, level=0.0)
        verts_ind = np.round(verts).astype(int)
        verts = verts * self.voxel_size + np.asarray(self.origin).reshape(1, 3)

        vertex_attributes = {}
        colors = None
        if "semseg" in self.attribute_vols:
            semseg_vol = np.asarray(self.attribute_vols["semseg"])
            semseg = semseg_vol[verts_ind[:, 0], verts_ind[:, 1], verts_ind[:, 2]]
            vertex_attributes["semseg"] = semseg
            if attribute == "semseg":
                from ..data.colormaps import NYU40_COLORMAP

                cm = np.array(NYU40_COLORMAP)
                label = semseg.copy()
                label[(label < 0) | (label >= len(cm))] = 0
                colors = cm[label, :]
        if "instance" in self.attribute_vols:
            inst_vol = np.asarray(self.attribute_vols["instance"])
            inst = inst_vol[verts_ind[:, 0], verts_ind[:, 1], verts_ind[:, 2]]
            vertex_attributes["instance"] = inst
        if attribute == "color" and "color" in self.attribute_vols:
            color_vol = np.clip(np.asarray(self.attribute_vols["color"]), 0, 255).astype(np.uint8)
            colors = color_vol[:, verts_ind[:, 0], verts_ind[:, 1], verts_ind[:, 2]].T

        return Mesh(
            vertices=verts, faces=faces, vertex_colors=colors,
            vertex_attributes=vertex_attributes,
        )


def _marching_cubes(volume: np.ndarray, level: float = 0.0):
    """Host marching cubes; native C++ extension when built, else skimage."""
    try:
        from ..native import marching_cubes as native_mc  # type: ignore

        return native_mc(volume, level)
    except Exception:
        from skimage import measure

        verts, faces, _, _ = measure.marching_cubes(volume, level=level)
        return verts, faces
