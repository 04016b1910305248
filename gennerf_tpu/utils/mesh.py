"""Minimal triangle-mesh container with PLY I/O.

Stands in for the reference's trimesh.Trimesh usage (container + .export;
reference src/data/tsdf.py:227, src/models/voxel_net.py:382) without the
external dependency. Binary little-endian PLY, readable by Open3D/MeshLab/
trimesh.
"""
from __future__ import annotations

import struct
from typing import Dict, Optional

import numpy as np


class Mesh:
    """Triangle mesh: vertices (V, 3) float, faces (F, 3) int,
    optional per-vertex uint8 colors and arbitrary vertex attributes."""

    def __init__(
        self,
        vertices: np.ndarray,
        faces: Optional[np.ndarray] = None,
        vertex_colors: Optional[np.ndarray] = None,
        vertex_attributes: Optional[Dict[str, np.ndarray]] = None,
        process: bool = False,  # API compat; no processing performed
    ):
        self.vertices = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
        self.faces = (
            np.zeros((0, 3), np.int64)
            if faces is None
            else np.asarray(faces, dtype=np.int64).reshape(-1, 3)
        )
        self.vertex_colors = (
            None if vertex_colors is None else np.asarray(vertex_colors).reshape(-1, 3)
        )
        self.vertex_attributes = dict(vertex_attributes or {})

    def __len__(self):
        return len(self.vertices)

    @property
    def is_empty(self) -> bool:
        return len(self.vertices) == 0

    def bounds(self) -> np.ndarray:
        """(2, 3) min/max corner."""
        if self.is_empty:
            return np.zeros((2, 3))
        return np.stack([self.vertices.min(0), self.vertices.max(0)])

    # -- IO -------------------------------------------------------------------
    def export(self, path: str) -> None:
        if str(path).endswith(".ply"):
            self._export_ply(path)
        else:
            raise ValueError(f"unsupported mesh format: {path}")

    def _export_ply(self, path: str) -> None:
        has_color = self.vertex_colors is not None
        V, F = len(self.vertices), len(self.faces)
        header = ["ply", "format binary_little_endian 1.0", f"element vertex {V}"]
        header += [f"property float {a}" for a in "xyz"]
        if has_color:
            header += [f"property uchar {c}" for c in ("red", "green", "blue")]
        header += [f"element face {F}", "property list uchar int vertex_indices", "end_header"]
        with open(path, "wb") as f:
            f.write(("\n".join(header) + "\n").encode())
            verts = self.vertices.astype("<f4")
            if has_color:
                colors = np.clip(self.vertex_colors, 0, 255).astype(np.uint8)
                for v, c in zip(verts, colors):
                    f.write(struct.pack("<3f3B", *v, *c))
            else:
                f.write(verts.tobytes())
            faces = self.faces.astype("<i4")
            body = b"".join(
                struct.pack("<B3i", 3, *face) for face in faces
            ) if F else b""
            f.write(body)

    @classmethod
    def load(cls, path: str) -> "Mesh":
        """Load a PLY written by `export` (binary little-endian, our layout)."""
        with open(path, "rb") as f:
            data = f.read()
        end = data.index(b"end_header\n") + len(b"end_header\n")
        header = data[:end].decode().splitlines()
        V = F = 0
        has_color = False
        for line in header:
            if line.startswith("element vertex"):
                V = int(line.split()[-1])
            elif line.startswith("element face"):
                F = int(line.split()[-1])
            elif line.startswith("property uchar red"):
                has_color = True
        off = end
        if has_color:
            verts = np.zeros((V, 3), np.float32)
            colors = np.zeros((V, 3), np.uint8)
            for i in range(V):
                x, y, z, r, g, b = struct.unpack_from("<3f3B", data, off)
                verts[i] = (x, y, z)
                colors[i] = (r, g, b)
                off += 15
        else:
            verts = np.frombuffer(data, "<f4", V * 3, off).reshape(V, 3).copy()
            colors = None
            off += V * 12
        faces = np.zeros((F, 3), np.int64)
        for i in range(F):
            n = data[off]
            assert n == 3
            faces[i] = struct.unpack_from("<3i", data, off + 1)
            off += 13
        return cls(verts, faces, colors)
