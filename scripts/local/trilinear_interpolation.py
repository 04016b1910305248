#!/usr/bin/env python3
"""Visual + numeric verification of the trilinear interpolation op.

Reference: scripts/local/trilinear_interpolation.py (renders interpolated
colors as spheres in Open3D and compares against a slow reference
implementation). Headless version: compares the fused op against a pure
per-point numpy implementation and writes a scatter visualization.

Usage: python scripts/local/trilinear_interpolation.py [--out trilinear_check.png]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def reference_trilinear(vol, xyz, origin, voxel_size):
    """The 'inefficient' per-point oracle (reference script :105)."""
    nx, ny, nz, C = vol.shape
    out = np.zeros((len(xyz), C), np.float32)
    for i, p in enumerate(xyz):
        q = (p - origin) / (np.array([nx, ny, nz]) * voxel_size)  # [0, 1]
        idx = q * (np.array([nx, ny, nz]) - 1)
        lo = np.clip(np.floor(idx).astype(int), 0, [nx - 1, ny - 1, nz - 1])
        hi = np.clip(lo + 1, 0, [nx - 1, ny - 1, nz - 1])
        w = idx - np.floor(idx)
        acc = 0
        for dx, wx in [(0, 1 - w[0]), (1, w[0])]:
            for dy, wy in [(0, 1 - w[1]), (1, w[1])]:
                for dz, wz in [(0, 1 - w[2]), (1, w[2])]:
                    c = [lo[0] if dx == 0 else hi[0], lo[1] if dy == 0 else hi[1],
                         lo[2] if dz == 0 else hi[2]]
                    acc = acc + wx * wy * wz * vol[c[0], c[1], c[2]]
        out[i] = acc
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="trilinear_check.png")
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from gennerf_tpu import ops

    rng = np.random.default_rng(0)
    nx, ny, nz, C = 8, 8, 8, 3
    vol = rng.random((nx, ny, nz, C)).astype(np.float32)
    voxel_size = 0.25
    origin = np.zeros(3, np.float32)
    xyz = rng.uniform(0.1, nx * voxel_size - 0.1, (200, 3)).astype(np.float32)

    fast = np.asarray(ops.trilinear_interpolation(
        jnp.asarray(vol)[None], jnp.asarray(xyz)[None], jnp.asarray(origin), voxel_size
    ))[0]
    slow = reference_trilinear(vol, xyz, origin, voxel_size)
    err = np.abs(fast - slow).max()
    print(f"max abs difference vs per-point oracle: {err:.2e}")
    assert err < 1e-4, "trilinear interpolation mismatch!"

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(xyz[:, 0], xyz[:, 1], xyz[:, 2], c=np.clip(fast, 0, 1), s=24)
    ax.set_title(f"trilinear colors at query points (max err {err:.1e})")
    fig.savefig(args.out, dpi=100)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
