"""CPU-side preprocessing transforms.

Reference: src/data/transforms.py. Same pipeline semantics over numpy +
PIL; the 3D resample inside TransformSpace runs through the (jit'd) JAX
TSDF.transform — on a TPU host that executes on-device, which is where the
grid-sample belongs.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
from PIL import Image, ImageOps


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, data):
        for t in self.transforms:
            data = t(data)
        return data


class ToArray:
    """PIL -> numpy (the reference's ToTensor; images become (3, H, W)
    float32)."""

    def __call__(self, data):
        for frame in data["frames"]:
            image = np.array(frame["image"], dtype=np.float32)
            frame["image"] = image.transpose(2, 0, 1)
            frame["intrinsics"] = np.asarray(frame["intrinsics"], np.float32)
            frame["pose"] = np.asarray(frame["pose"], np.float32)
            if "depth" in frame:
                frame["depth"] = np.asarray(frame["depth"], np.float32)
            if "instance" in frame:
                frame["instance"] = np.asarray(frame["instance"], np.int64)
        return data


# torch-API alias (reference name)
ToTensor = ToArray


class IntrinsicsPoseToProjection:
    """projection = K @ pose^-1[:3] (reference transforms.py:51-60)."""

    def __call__(self, data):
        for frame in data["frames"]:
            K = np.asarray(frame["intrinsics"], np.float32)
            pose = np.asarray(frame["pose"], np.float32)
            frame["projection"] = (K @ np.linalg.inv(pose)[:3]).astype(np.float32)
        return data


def pad_scannet(frame):
    """1296x968 -> 1296x972 (4:3) by 2px vertical padding
    (reference transforms.py:63-74)."""
    w, h = frame["image"].size
    if w == 1296 and h == 968:
        frame["image"] = ImageOps.expand(frame["image"], border=(0, 2))
        frame["intrinsics"][1, 2] += 2
        if frame.get("instance") is not None and hasattr(frame["instance"], "size"):
            frame["instance"] = ImageOps.expand(frame["instance"], border=(0, 2))
    return frame


class ResizeImage:
    """Resize images (+ rescale intrinsics); depth resized NEAREST
    (reference transforms.py:77-108)."""

    def __init__(self, size):
        self.size = size

    def __call__(self, data):
        for frame in data["frames"]:
            pad_scannet(frame)
            w, h = frame["image"].size
            frame["image"] = frame["image"].resize(self.size, Image.BILINEAR)
            frame["intrinsics"][0, :] /= w / self.size[0]
            frame["intrinsics"][1, :] /= h / self.size[1]
            if "depth" in frame:
                frame["depth"] = frame["depth"].resize(self.size, Image.NEAREST)
            if frame.get("instance") is not None and hasattr(frame["instance"], "resize"):
                frame["instance"] = frame["instance"].resize(self.size, Image.NEAREST)
        return data

    def __repr__(self):
        return f"ResizeImage(size={self.size})"


def transform_space(data, transform: np.ndarray, voxel_dim, origin):
    """Apply a 4x4 world-frame transform to poses and all TSDF volumes
    (reference transforms.py:162-176)."""
    import jax.numpy as jnp

    inv = np.linalg.inv(np.asarray(transform, np.float64)).astype(np.float32)
    for frame in data["frames"]:
        frame["pose"] = (inv @ np.asarray(frame["pose"], np.float32)).astype(np.float32)

    voxel_sizes = [int(key[4:]) for key in data if key[:3] == "vol"]
    for voxel_size in voxel_sizes:
        scale = voxel_size / min(voxel_sizes)
        vd = [int(v / scale) for v in voxel_dim]
        key = "vol_%02d" % voxel_size
        data[key] = data[key].transform(jnp.asarray(transform, jnp.float32), vd, origin)
    return data


class TransformSpace:
    def __init__(self, transform, voxel_dim, origin):
        self.transform = np.asarray(transform, np.float32)
        self.voxel_dim = voxel_dim
        self.origin = origin

    def __call__(self, data):
        return transform_space(data, self.transform, self.voxel_dim, self.origin)


class RandomTransformSpace:
    """Random z-rotation + crop-translation of the world frame, applied to
    poses AND the GT TSDF (the 3D augmentation workhorse; reference
    transforms.py:194-270)."""

    def __init__(self, voxel_dim, random_rotation=True, random_translation=True,
                 paddingXY=1.5, paddingZ=0.25, origin=(0, 0, 0), rng=None):
        self.voxel_dim = voxel_dim
        self.origin = list(origin)
        self.random_rotation = random_rotation
        self.random_translation = random_translation
        self.padding_start = np.array([paddingXY, paddingXY, paddingZ], np.float32)
        self.padding_end = np.array([paddingXY, paddingXY, 0], np.float32)
        self.rng = rng or np.random.default_rng()

    def __call__(self, data):
        voxel_sizes = [int(key[4:]) for key in data if key[:3] == "vol"]
        if not voxel_sizes:
            return data
        tsdf = data["vol_%02d" % min(voxel_sizes)]

        r = self.rng.random() * 2 * np.pi if self.random_rotation else 0.0
        R = np.array([[np.cos(r), -np.sin(r)], [np.sin(r), np.cos(r)]], np.float32)

        dims = np.array(tsdf.tsdf_vol.shape, np.float32) * tsdf.voxel_size
        origin = np.asarray(tsdf.origin).reshape(3)
        xmin, ymin, zmin = origin
        xmax, ymax, zmax = origin + dims
        corners2d = R @ np.array([[xmin, xmin, xmax, xmax], [ymin, ymax, ymin, ymax]], np.float32)

        xmin, xmax = corners2d[0].min(), corners2d[0].max()
        ymin, ymax = corners2d[1].min(), corners2d[1].max()

        start = np.array([xmin, ymin, zmin], np.float32) - self.padding_start
        end = (
            -np.asarray(self.voxel_dim, np.float32) * tsdf.voxel_size
            + np.array([xmax, ymax, zmax], np.float32)
            + self.padding_end
        )
        t = self.rng.random(3).astype(np.float32) if self.random_translation else 0.5
        t = t * start + (1 - t) * end

        T = np.eye(4, dtype=np.float32)
        T[:2, :2] = R
        T[:3, 3] = -t
        return transform_space(data, np.linalg.inv(T).astype(np.float32), self.voxel_dim, self.origin)


class FlattenTSDF:
    """TSDF objects -> flat 'vol_XX_tsdf' arrays for collation
    (reference transforms.py:276-290)."""

    def __call__(self, data):
        import numpy as np

        for key in list(data.keys()):
            if key[:3] == "vol" and not key.endswith("_tsdf"):
                tsdf = data.pop(key)
                data["vol_" + key[4:] + "_tsdf"] = np.asarray(tsdf.tsdf_vol)[None]
                for attr, vol in tsdf.attribute_vols.items():
                    data["vol_" + key[4:] + "_" + attr] = np.asarray(vol)
        return data
