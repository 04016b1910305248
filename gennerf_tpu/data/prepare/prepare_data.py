"""Offline GT TSDF generation by depth fusion.

Reference: src/data/prepare/prepare_data.py. Volume bounds come from
quantiles of the backprojected depth clouds (+margin); fusion runs at
4/8/16 cm through the jit'd scan fusion (the per-voxel-per-frame hot loop
the reference ran as masked torch ops, SURVEY §3.4).

CLI: python -m gennerf_tpu.data.prepare.prepare_data --path RAW --path_meta OUT [--i I --n N]
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import numpy as np

from .. import transforms as T
from ..datasets import SceneDataset, load_info_json
from .scannet import prepare_scannet_scene, prepare_scannet_splits


def update_info_json(info_file: str, voxel_size: int, file_name_vol: str):
    data = load_info_json(info_file)
    data["file_name_vol_%02d" % voxel_size] = file_name_vol
    with open(info_file, "w") as f:
        json.dump(data, f)


def clean_info(scene: str, path_meta: str):
    """Strip node-local temp paths after prep (reference prepare_data.py:233)."""
    info_file = os.path.join(path_meta, scene, "info.json")
    data = load_info_json(info_file)
    for frame in data["frames"]:
        frame.pop("file_name_image_temp", None)
        frame.pop("file_name_depth_temp", None)
    with open(info_file, "w") as f:
        json.dump(data, f)


def fuse_scene(
    path_meta: str,
    scene: str,
    voxel_size: int,
    trunc_ratio: float = 3,
    max_depth: float = 3.0,
    vol_prcnt: float = 0.995,
    vol_margin: float = 1.5,
    verbose: int = 2,
    skip_existing: bool = False,
    from_archive: bool = False,
):
    """Fuse GT depth maps into a TSDF at `voxel_size` cm
    (reference prepare_data.py:32-149)."""
    import jax
    import jax.numpy as jnp

    from ...ops.projection import depth_to_world
    from ...tsdf import TSDFFusion

    if verbose > 0:
        print(f"fusing {scene} voxel size {voxel_size}")
    file_name_vol = os.path.join(path_meta, scene, "tsdf_%02d.npz" % voxel_size)
    file_name_mesh = os.path.join(path_meta, scene, "mesh_%02d.ply" % voxel_size)
    info_file = os.path.join(path_meta, scene, "info.json")

    if skip_existing and os.path.exists(file_name_vol) and os.path.exists(file_name_mesh):
        update_info_json(info_file, voxel_size, file_name_vol)
        return

    transform = T.Compose([
        T.ResizeImage((640, 480)),
        T.ToArray(),
        T.IntrinsicsPoseToProjection(),
    ])
    dataset = SceneDataset(info_file, transform, frame_types=["depth"], from_archive=from_archive)

    # pass 1: volume bounds from <=200 evenly spaced frames
    inds = (
        range(len(dataset))
        if len(dataset) <= 200
        else np.linspace(0, len(dataset) - 1, 200).astype(int)
    )
    pts = []
    for i in inds:
        frame = dataset[int(i)]
        depth = np.asarray(frame["depth"], np.float32)
        depth = np.where(depth > max_depth, 0.0, depth)
        p = np.asarray(depth_to_world(jnp.asarray(frame["projection"]), jnp.asarray(depth))).T
        pts.append(p[depth.reshape(-1) > 0])
    pts = np.concatenate(pts)
    pts = pts[np.isfinite(pts[:, 0])]
    origin = np.quantile(pts, 1 - vol_prcnt, axis=0) - vol_margin
    vol_max = np.quantile(pts, vol_prcnt, axis=0) + vol_margin
    vs = float(voxel_size) / 100
    vol_dim = tuple(((vol_max - origin) / vs).astype(int).tolist())

    # pass 2: fuse every frame
    fusion = TSDFFusion(vol_dim, vs, tuple(origin.astype(np.float32)), trunc_ratio, color=True)
    for i in range(len(dataset)):
        if verbose > 1 and i % 25 == 0:
            print(f"{scene} integrating voxel size {voxel_size} {i}/{len(dataset)}")
        frame = dataset[i]
        depth = np.asarray(frame["depth"], np.float32)
        depth = np.where(depth > max_depth, 0.0, depth)
        fusion.integrate(
            jnp.asarray(frame["projection"]),
            jnp.asarray(depth),
            jnp.asarray(np.asarray(frame["image"], np.float32)),
        )

    tsdf = fusion.get_tsdf()
    tsdf.save(file_name_vol)
    tsdf.get_mesh().export(file_name_mesh)
    update_info_json(info_file, voxel_size, file_name_vol)


def prepare_scannet(
    path: str,
    path_meta: str,
    i: int = 0,
    n: int = 1,
    test_only: bool = False,
    max_depth: float = 3.0,
    skip_existing: bool = False,
    verbose: int = 2,
    voxel_sizes=(4, 8, 16),
):
    """Prepare the full dataset, shard `i` of `n`
    (reference prepare_data.py:248-292)."""
    scenes = []
    if not test_only:
        scenes += sorted(
            os.path.join("scans", s) for s in os.listdir(os.path.join(path, "scans"))
        )
    if os.path.isdir(os.path.join(path, "scans_test")):
        scenes += sorted(
            os.path.join("scans_test", s)
            for s in os.listdir(os.path.join(path, "scans_test"))
        )
    scenes = scenes[i::n]
    if i == 0:
        prepare_scannet_splits(path, path_meta)
    for scene in scenes:
        prepare_scannet_scene(scene, path, path_meta, verbose)
        for voxel_size in voxel_sizes:
            fuse_scene(
                path_meta, scene, voxel_size, max_depth=max_depth,
                skip_existing=skip_existing, verbose=verbose,
            )
        clean_info(scene, path_meta)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Fuse ground truth TSDF on ScanNet")
    parser.add_argument("--path", required=True)
    parser.add_argument("--path_meta", required=True)
    parser.add_argument("--i", default=0, type=int)
    parser.add_argument("--n", default=1, type=int)
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--max_depth", default=3.0, type=float)
    parser.add_argument("--skip_existing", action="store_true")
    parser.add_argument("--verbose", default=1, type=int)
    args = parser.parse_args(argv)
    assert 0 <= args.i < args.n
    prepare_scannet(
        os.path.expandvars(args.path), os.path.expandvars(args.path_meta),
        args.i, args.n, args.test, args.max_depth, args.skip_existing, args.verbose,
    )


if __name__ == "__main__":
    main()
