#!/usr/bin/env python3
"""Render the artifacts a training run logged under <run>/local/.

Reference: scripts/local/full_visualization.py (interactive Open3D viewer of
logged tensors/meshes). Headless version: renders every logged mesh from an
auto-framed camera and plots logged point tensors, writing PNGs beside the
artifacts.

Usage: python scripts/local/full_visualization.py --run <output_dir>
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--run", required=True, help="training output dir")
    parser.add_argument("--size", type=int, nargs=2, default=(480, 640))
    args = parser.parse_args(argv)

    from gennerf_tpu.utils.mesh import Mesh
    from gennerf_tpu.utils.visuals import compute_camera_pose, render_mesh
    from gennerf_tpu.utils.image import write_png

    local = os.path.join(args.run, "local")
    H, W = args.size
    K = np.array([[0.8 * W, 0, W / 2], [0, 0.8 * W, H / 2], [0, 0, 1]], np.float32)

    for ply in sorted(glob.glob(os.path.join(local, "**", "*.ply"), recursive=True)):
        mesh = Mesh.load(ply)
        if mesh.is_empty:
            print(f"{ply}: empty mesh, skipped")
            continue
        pose = compute_camera_pose(mesh, K, W, H)
        rgb, _ = render_mesh(mesh, K, pose, H, W)
        out = ply.replace(".ply", "_render.png")
        write_png(out, rgb)
        print(f"wrote {out}")

    for npy in sorted(glob.glob(os.path.join(local, "**", "*.npy"), recursive=True)):
        arr = np.load(npy)
        if arr.ndim >= 2 and arr.shape[-1] == 3:  # point tensors
            pts = arr.reshape(-1, 3)
            fig = plt.figure(figsize=(6, 6))
            ax = fig.add_subplot(projection="3d")
            sel = pts[:: max(1, len(pts) // 5000)]
            ax.scatter(sel[:, 0], sel[:, 1], sel[:, 2], s=1)
            ax.set_title(os.path.basename(npy))
            out = npy.replace(".npy", "_points.png")
            fig.savefig(out, dpi=100)
            plt.close(fig)
            print(f"wrote {out}")


if __name__ == "__main__":
    main()
