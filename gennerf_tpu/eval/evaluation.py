"""Offline full evaluation of predicted scene reconstructions.

Reference: src/models/evaluation.py. Per scene: render the predicted mesh
into every GT view (native software rasterizer replaces pyrender/EGL),
compute 2D depth metrics, re-fuse the rendered depths to trim hole-fill,
then TSDF L1 + mesh precision/recall/F-score; writes {scene}_metrics.json.

CLI: python -m gennerf_tpu.eval.evaluation --results <dir> --dataset <split.txt or info.json>
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Dict

import numpy as np

from ..data.datasets import SceneDataset, parse_splits_list
from ..tsdf import TSDF, TSDFFusion
from ..utils.mesh import Mesh
from .metrics import eval_depth, eval_mesh, eval_tsdf


def render_mesh_depth(mesh: Mesh, intrinsics, pose, height, width) -> np.ndarray:
    from ..native import rasterize_depth

    if mesh.is_empty:
        return np.zeros((height, width), np.float32)
    return rasterize_depth(mesh.vertices, mesh.faces, intrinsics, pose, height, width)


def process(info_file: str, results_dir: str, max_depth: float = 10.0,
            num_frames: int = -1, from_archive: bool = False) -> Dict:
    """Evaluate one scene (reference evaluation.py:75-174)."""
    dataset = SceneDataset(info_file, frame_types=["depth"], num_frames=num_frames,
                           from_archive=from_archive)
    scene = dataset.info["scene"]
    voxel_size_cm = min(
        int(k.rsplit("_", 1)[1]) for k in dataset.info if k.startswith("file_name_vol_")
    )
    voxel_size = voxel_size_cm / 100.0

    # load predicted tsdf + mesh (written by predict.py)
    pred_tsdf = TSDF.load(os.path.join(results_dir, f"{scene}.npz"))
    pred_mesh = Mesh.load(os.path.join(results_dir, f"{scene}.ply"))

    # GT
    trgt_tsdf = TSDF.load(dataset.info["file_name_vol_%02d" % voxel_size_cm])
    # ScanNet ships a clean GT mesh; scenes prepared from bare .sens
    # containers (synthetic / self-captured) only have the fused GT TSDF —
    # mesh that instead of failing (info.json records the expected mesh
    # path whether or not the raw data provided one)
    mesh_gt_path = dataset.info.get("file_name_mesh_gt")
    if mesh_gt_path and os.path.exists(mesh_gt_path):
        trgt_mesh = Mesh.load(mesh_gt_path)
    else:
        if mesh_gt_path:
            print(f"{scene}: GT mesh {mesh_gt_path} absent -> meshing the "
                  f"fused GT TSDF at {voxel_size_cm} cm instead")
        trgt_mesh = trgt_tsdf.get_mesh()

    # per-frame depth metrics + re-fusion of rendered depths (trims the
    # hole-filled regions the model invents outside observed space)
    nx, ny, nz = (np.array(trgt_tsdf.tsdf_vol.shape)).tolist()
    refusion = TSDFFusion(
        (nx, ny, nz), voxel_size,
        tuple(np.asarray(trgt_tsdf.origin).reshape(3)), color=False,
    )
    depth_metrics: Dict[str, float] = {}
    n = 0
    import jax.numpy as jnp

    for i in range(len(dataset)):
        frame = dataset[i]
        depth_trgt = np.asarray(frame["depth"], np.float32)
        H, W = depth_trgt.shape
        depth_pred = render_mesh_depth(pred_mesh, frame["intrinsics"], frame["pose"], H, W)
        depth_pred[depth_pred > max_depth] = 0
        m = eval_depth(depth_pred, depth_trgt)
        for k, v in m.items():
            depth_metrics[k] = depth_metrics.get(k, 0.0) + v
        n += 1
        projection = frame["intrinsics"] @ np.linalg.inv(frame["pose"])[:3]
        refusion.integrate(jnp.asarray(projection.astype(np.float32)), jnp.asarray(depth_pred))
    depth_metrics = {k: v / max(n, 1) for k, v in depth_metrics.items()}

    # trim predicted mesh by re-fused observation mask
    trimmed_mesh = refusion.get_tsdf().get_mesh()

    metrics = {"scene": scene}
    metrics.update(depth_metrics)
    metrics.update(eval_tsdf(pred_tsdf, trgt_tsdf))
    metrics.update(eval_mesh(trimmed_mesh if not trimmed_mesh.is_empty else pred_mesh, trgt_mesh))

    out_path = os.path.join(results_dir, f"{scene}_metrics.json")
    with open(out_path, "w") as f:
        json.dump(metrics, f, indent=2)
    return metrics


def main(argv=None):
    parser = argparse.ArgumentParser(description="full scene evaluation")
    parser.add_argument("--results", required=True, help="dir with {scene}.npz/{scene}.ply")
    parser.add_argument("--dataset", required=True, nargs="+",
                        help="info.json paths or split .txt files")
    parser.add_argument("--data-dir", default=None)
    parser.add_argument("--num-frames", type=int, default=-1)
    parser.add_argument("--max-depth", type=float, default=10.0)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (the registered "
                        "accelerator plugin is otherwise always used)")
    args = parser.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    info_files = parse_splits_list(args.dataset, args.data_dir)
    all_metrics = []
    for info_file in info_files:
        m = process(info_file, args.results, args.max_depth, args.num_frames)
        print(json.dumps(m))
        all_metrics.append(m)
    # aggregate
    if all_metrics:
        agg = {
            k: float(np.mean([m[k] for m in all_metrics]))
            for k in all_metrics[0]
            if isinstance(all_metrics[0][k], (int, float))
        }
        with open(os.path.join(args.results, "metrics_mean.json"), "w") as f:
            json.dump(agg, f, indent=2)
        print("mean:", json.dumps(agg))
    return all_metrics


if __name__ == "__main__":
    main()
