#!/usr/bin/env python3
"""Unproject a prepared scene's RGB-D frames into a colored world point
cloud (headless).

Reference: scripts/draft/process_input.py (cv2/Open3D viewer that fuses the
exported ScanNet frames into one colored cloud). This version reads frames
through the canonical info.json reader, unprojects with the library's
`get_3d_points`, writes a colored PLY plus a top-down scatter PNG — a quick
eyeball check that poses/intrinsics/depth agree after data prep.

Usage:
    python scripts/local/process_input.py --info <scene>/info.json \
        [--frames 0 10 20] [--out /tmp/process_input]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--info", required=True, help="scene info.json")
    parser.add_argument("--frames", type=int, nargs="*", default=None,
                        help="frame indices (default: 8 evenly spaced)")
    parser.add_argument("--out", default="/tmp/process_input")
    parser.add_argument("--max-points", type=int, default=400000)
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from gennerf_tpu import ops
    from gennerf_tpu.data.datasets import load_info_json, map_frames
    from gennerf_tpu.utils.mesh import Mesh

    info = load_info_json(args.info)
    n = len(info["frames"])
    idxs = args.frames if args.frames else np.linspace(0, n - 1, min(8, n), dtype=int)
    frames = map_frames(info["frames"], idxs, ("image", "depth"), False)

    clouds, colors = [], []
    for f in frames:
        depth = np.asarray(f["depth"], np.float32)
        image = np.asarray(f["image"], np.float32)  # (H, W, 3) uint8-scale
        intr = np.asarray(f["intrinsics"], np.float32)[:3, :3]
        pose = np.asarray(f["pose"], np.float32)
        proj = (intr @ np.linalg.inv(pose)[:3])[None]
        pts = np.asarray(
            ops.get_3d_points(jnp.asarray(depth[None]), jnp.asarray(proj))
        )[0].reshape(-1, 3)
        mask = depth.reshape(-1) > 0
        clouds.append(pts[mask])
        colors.append(image.reshape(-1, 3)[mask])
    pts = np.concatenate(clouds)
    rgb = np.concatenate(colors)
    if len(pts) > args.max_points:
        sel = np.random.default_rng(0).choice(len(pts), args.max_points, replace=False)
        pts, rgb = pts[sel], rgb[sel]

    os.makedirs(args.out, exist_ok=True)
    ply = os.path.join(args.out, "input_cloud.ply")
    # a point cloud is a mesh with no faces; colors in [0, 255]
    Mesh(pts.astype(np.float32), np.zeros((0, 3), np.int32),
         vertex_colors=rgb.astype(np.uint8)).export(ply)
    print(f"wrote {ply} ({len(pts)} pts from {len(idxs)} frames)")

    fig, axes = plt.subplots(1, 2, figsize=(14, 7))
    axes[0].scatter(pts[:, 0], pts[:, 1], s=0.3, c=rgb / 255.0)
    axes[0].set_title("top-down (x, y)")
    axes[1].scatter(pts[:, 0], pts[:, 2], s=0.3, c=rgb / 255.0)
    axes[1].set_title("side (x, z)")
    for ax in axes:
        ax.set_aspect("equal")
    png = os.path.join(args.out, "input_cloud.png")
    fig.savefig(png, dpi=110)
    plt.close(fig)
    print(f"wrote {png}")


if __name__ == "__main__":
    main()
