"""ScanNet .sens binary decoder and exporter.

Reference: src/data/prepare/SensorData.py (itself from the ScanNet SDK).
Dependency-light re-implementation: struct for the container, zlib for the
depth stream, PIL for jpeg decode/encode, our PNG writer for 16-bit depth.
"""
from __future__ import annotations

import io
import os
import struct
import tarfile
from typing import Optional, Tuple

import numpy as np

from ...utils.image import write_png

COMPRESSION_TYPE_COLOR = {-1: "unknown", 0: "raw", 1: "png", 2: "jpeg"}
COMPRESSION_TYPE_DEPTH = {-1: "unknown", 0: "raw_ushort", 1: "zlib_ushort", 2: "occi_ushort"}


class RGBDFrame:
    def load(self, f):
        self.camera_to_world = np.asarray(
            struct.unpack("f" * 16, f.read(16 * 4)), dtype=np.float32
        ).reshape(4, 4)
        self.timestamp_color = struct.unpack("Q", f.read(8))[0]
        self.timestamp_depth = struct.unpack("Q", f.read(8))[0]
        color_size = struct.unpack("Q", f.read(8))[0]
        depth_size = struct.unpack("Q", f.read(8))[0]
        self.color_data = f.read(color_size)
        self.depth_data = f.read(depth_size)

    def decompress_depth(self, compression_type: str) -> bytes:
        if compression_type == "zlib_ushort":
            import zlib

            return zlib.decompress(self.depth_data)
        if compression_type == "raw_ushort":
            return self.depth_data
        raise ValueError(f"invalid depth compression {compression_type}")

    def decompress_color(self, compression_type: str) -> np.ndarray:
        if compression_type == "jpeg":
            from PIL import Image

            return np.asarray(Image.open(io.BytesIO(self.color_data)))
        raise ValueError(f"invalid color compression {compression_type}")


def _resize_nearest(arr: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """(H, W[, C]) nearest resize to (h, w)."""
    h, w = size
    ys = (np.arange(h) * arr.shape[0] / h).astype(int)
    xs = (np.arange(w) * arr.shape[1] / w).astype(int)
    return arr[ys][:, xs]


class SensorData:
    """Parser for .sens v4 containers."""

    VERSION = 4

    def __init__(self, filename: str, archive_result: bool = False):
        self.archive_result = archive_result
        self.load(filename)

    def load(self, filename: str):
        with open(filename, "rb") as f:
            version = struct.unpack("I", f.read(4))[0]
            assert version == self.VERSION, f"unsupported .sens version {version}"
            strlen = struct.unpack("Q", f.read(8))[0]
            self.sensor_name = f.read(strlen).decode("utf-8")
            self.intrinsic_color = np.asarray(struct.unpack("f" * 16, f.read(64)), np.float32).reshape(4, 4)
            self.extrinsic_color = np.asarray(struct.unpack("f" * 16, f.read(64)), np.float32).reshape(4, 4)
            self.intrinsic_depth = np.asarray(struct.unpack("f" * 16, f.read(64)), np.float32).reshape(4, 4)
            self.extrinsic_depth = np.asarray(struct.unpack("f" * 16, f.read(64)), np.float32).reshape(4, 4)
            self.color_compression_type = COMPRESSION_TYPE_COLOR[struct.unpack("i", f.read(4))[0]]
            self.depth_compression_type = COMPRESSION_TYPE_DEPTH[struct.unpack("i", f.read(4))[0]]
            self.color_width = struct.unpack("I", f.read(4))[0]
            self.color_height = struct.unpack("I", f.read(4))[0]
            self.depth_width = struct.unpack("I", f.read(4))[0]
            self.depth_height = struct.unpack("I", f.read(4))[0]
            self.depth_shift = struct.unpack("f", f.read(4))[0]
            num_frames = struct.unpack("Q", f.read(8))[0]
            self.frames = []
            for _ in range(num_frames):
                frame = RGBDFrame()
                frame.load(f)
                self.frames.append(frame)

    # -- exporters ------------------------------------------------------------
    def _export_loop(self, output_path, ext, render, frame_skip, skip_existing):
        output_dir = os.path.abspath(output_path)
        if os.path.exists(output_dir) and skip_existing:
            return
        os.makedirs(output_dir, exist_ok=True)
        names = []
        for i in range(0, len(self.frames), frame_skip):
            fname = os.path.join(output_dir, f"{i}{ext}")
            render(i, fname)
            names.append(fname)
        if self.archive_result:
            archive = os.path.join(output_dir, os.path.basename(output_dir) + ".tar")
            with tarfile.open(archive, "w") as tar:
                for fname in names:
                    tar.add(fname, arcname=os.path.basename(fname))
                    os.remove(fname)

    def export_depth_images(self, output_path, image_size=None, frame_skip=1, skip_existing=True):
        def render(i, fname):
            raw = self.frames[i].decompress_depth(self.depth_compression_type)
            depth = np.frombuffer(raw, dtype=np.uint16).reshape(self.depth_height, self.depth_width)
            if image_size is not None:
                depth = _resize_nearest(depth, image_size)
            write_png(fname, depth)

        self._export_loop(output_path, ".png", render, frame_skip, skip_existing)

    def export_color_images(self, output_path, image_size=None, frame_skip=1, skip_existing=True):
        from PIL import Image

        def render(i, fname):
            color = self.frames[i].decompress_color(self.color_compression_type)
            if image_size is not None:
                color = _resize_nearest(color, image_size)
            Image.fromarray(color).save(fname, quality=95)

        self._export_loop(output_path, ".jpg", render, frame_skip, skip_existing)

    def export_poses(self, output_path, frame_skip=1, skip_existing=True):
        def render(i, fname):
            np.savetxt(fname, self.frames[i].camera_to_world, fmt="%f")

        self._export_loop(output_path, ".txt", render, frame_skip, skip_existing)

    def export_intrinsics(self, output_path, skip_existing=True):
        output_dir = os.path.abspath(output_path)
        if os.path.exists(output_dir) and skip_existing:
            return
        os.makedirs(output_dir, exist_ok=True)
        np.savetxt(os.path.join(output_dir, "intrinsic_color.txt"), self.intrinsic_color, fmt="%f")
        np.savetxt(os.path.join(output_dir, "extrinsic_color.txt"), self.extrinsic_color, fmt="%f")
        np.savetxt(os.path.join(output_dir, "intrinsic_depth.txt"), self.intrinsic_depth, fmt="%f")
        np.savetxt(os.path.join(output_dir, "extrinsic_depth.txt"), self.extrinsic_depth, fmt="%f")

    # -- .sens writer (for tests / synthetic fixtures) -------------------------
    @staticmethod
    def write(
        filename: str,
        intrinsic_color: np.ndarray,
        depths_mm: np.ndarray,
        colors: np.ndarray,
        poses: np.ndarray,
        depth_shift: float = 1000.0,
        sensor_name: str = "synthetic",
    ):
        """Write a minimal v4 .sens container (zlib depth, jpeg color)."""
        import zlib

        from PIL import Image

        T, H, W = depths_mm.shape
        CH, CW = colors.shape[1:3]
        eye = np.eye(4, dtype=np.float32)
        K = np.asarray(intrinsic_color, np.float32)
        K4 = eye.copy()
        K4[:3, :3] = K
        with open(filename, "wb") as f:
            f.write(struct.pack("I", 4))
            name = sensor_name.encode()
            f.write(struct.pack("Q", len(name)))
            f.write(name)
            for mat in (K4, eye, K4, eye):
                f.write(struct.pack("f" * 16, *mat.reshape(-1)))
            f.write(struct.pack("i", 2))  # jpeg
            f.write(struct.pack("i", 1))  # zlib_ushort
            f.write(struct.pack("I", CW))
            f.write(struct.pack("I", CH))
            f.write(struct.pack("I", W))
            f.write(struct.pack("I", H))
            f.write(struct.pack("f", depth_shift))
            f.write(struct.pack("Q", T))
            for t in range(T):
                buf = io.BytesIO()
                Image.fromarray(colors[t]).save(buf, format="JPEG", quality=95)
                color_data = buf.getvalue()
                depth_data = zlib.compress(depths_mm[t].astype("<u2").tobytes())
                f.write(struct.pack("f" * 16, *poses[t].astype(np.float32).reshape(-1)))
                f.write(struct.pack("Q", 0))
                f.write(struct.pack("Q", 0))
                f.write(struct.pack("Q", len(color_data)))
                f.write(struct.pack("Q", len(depth_data)))
                f.write(color_data)
                f.write(depth_data)
