#!/usr/bin/env python3
"""Visual check of the frustum sampler (headless).

Reference: scripts/frustum_sampling.py (interactive Open3D viewer of a
logged camera frustum + sampled points). This version drives the actual
`ops.sample_points_in_frustum` / `ops.sample_points_on_rays` samplers on a
synthetic frame (or a frame of a prepared scene), projects the camera
frustum wireframe and the sampled points into a 3D matplotlib figure, and
writes PNGs — the de-facto visual test loop of the reference (SURVEY §4),
runnable in CI containers.

Usage:
    python scripts/local/frustum_sampling.py --out /tmp/frustum
    python scripts/local/frustum_sampling.py --info <scene>/info.json --frame 0
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def frustum_wireframe(intrinsics, pose, near, far):
    """8 frustum corners in world space + the 12 connecting edges
    (reference scripts/frustum_sampling.py:7-59)."""
    corners = []
    for z in (near, far):
        h = z * intrinsics[1, 2] / intrinsics[1, 1] * 2
        w = z * intrinsics[0, 2] / intrinsics[0, 0] * 2
        corners += [
            [w / 2, h / 2, z], [-w / 2, h / 2, z],
            [-w / 2, -h / 2, z], [w / 2, -h / 2, z],
        ]
    corners = np.asarray(corners, np.float64)
    hom = np.concatenate([corners, np.ones((8, 1))], axis=1)
    world = (pose @ hom.T).T[:, :3]
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
             (0, 4), (1, 5), (2, 6), (3, 7)]
    return world, edges


def load_frame(args):
    if args.info:
        import json

        from gennerf_tpu.data.datasets import map_frames, load_info_json

        info = load_info_json(args.info)
        frames = map_frames(info["frames"], [args.frame], ("image", "depth"), False)
        f = frames[0]
        depth = np.asarray(f["depth"], np.float32)
        intr = np.asarray(f["intrinsics"], np.float32)[:3, :3]
        pose = np.asarray(f["pose"], np.float32)
        return depth, intr, pose
    # synthetic: camera at origin looking +z at a wall of depth 2.5m
    H, W = 120, 160
    depth = np.full((H, W), 2.5, np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    depth += 0.3 * np.sin(xx / 17.0) * np.cos(yy / 11.0)
    intr = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    return depth, intr, pose


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--info", default=None, help="scene info.json (optional)")
    parser.add_argument("--frame", type=int, default=0)
    parser.add_argument("--out", default="/tmp/frustum_sampling")
    parser.add_argument("--num-pixels", type=int, default=200)
    parser.add_argument("--near", type=float, default=0.5)
    parser.add_argument("--far", type=float, default=4.0)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gennerf_tpu import ops

    depth, intr, pose = load_frame(args)
    H, W = depth.shape
    os.makedirs(args.out, exist_ok=True)

    # world->image projection for unprojection of the full depth map
    proj = (intr @ np.linalg.inv(pose)[:3])[None]  # (1, 3, 4)
    cloud = np.asarray(
        ops.get_3d_points(jnp.asarray(depth[None]), jnp.asarray(proj))
    )[0].reshape(-1, 3)
    cloud = cloud[depth.reshape(-1) > 0]

    key = jax.random.PRNGKey(0)
    k_pix, k_fr, k_ray = jax.random.split(key, 3)
    b, h, w, ok = ops.sample_valid_depth_pixels(
        k_pix, jnp.asarray(depth[None]), args.num_pixels
    )
    frustum_pts, _ = ops.sample_points_in_frustum(
        k_fr, h, w, jnp.asarray(intr[None]), jnp.asarray(pose[None]),
        args.near, args.far,
    )
    sampled_depth = jnp.asarray(depth[None])[b, h, w]
    ray_pts, _ = ops.sample_points_on_rays(
        k_ray, h, w, sampled_depth, jnp.asarray(intr[None]),
        jnp.asarray(pose[None]), N=6, M=3, delta=0.1, min_dist=0.07, sigma=0.1,
    )

    corners, edges = frustum_wireframe(intr, pose, args.near, args.far)
    for name, pts in (("frustum", np.asarray(frustum_pts)[0]),
                      ("rays", np.asarray(ray_pts)[0].reshape(-1, 3))):
        fig = plt.figure(figsize=(8, 8))
        ax = fig.add_subplot(111, projection="3d")
        sub = cloud[:: max(1, len(cloud) // 4000)]
        ax.scatter(sub[:, 0], sub[:, 1], sub[:, 2], s=1, c="gray", alpha=0.3,
                   label="depth cloud")
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=6, c="red",
                   label=f"{name} samples")
        for i, j in edges:
            ax.plot(*zip(corners[i], corners[j]), c="blue", lw=1)
        ax.set_title(f"{name} sampling ({pts.shape[0]} pts)")
        ax.legend()
        path = os.path.join(args.out, f"{name}_sampling.png")
        fig.savefig(path, dpi=110)
        plt.close(fig)
        print(f"wrote {path}")

    # sanity: frustum samples lie between the near/far planes in camera space
    inv = np.linalg.inv(pose)
    cam = (inv[:3, :3] @ np.asarray(frustum_pts)[0].T + inv[:3, 3:]).T
    assert (cam[:, 2] >= args.near - 1e-4).all() and (cam[:, 2] <= args.far + 1e-4).all(), \
        "frustum samples escaped the near/far range"
    print(f"frustum z-range OK: [{cam[:, 2].min():.3f}, {cam[:, 2].max():.3f}]")


if __name__ == "__main__":
    main()
