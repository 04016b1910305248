#!/usr/bin/env python3
"""Export raw ScanNet .sens containers to per-frame files/archives.

Reference: scripts/read_scannet.py — per scene: decode <scene>.sens and
export color jpgs, 16-bit depth pngs, pose txts (optionally tar'd), and
intrinsics; runs a process pool over scenes.

Usage:
    python scripts/read_scannet.py --path RAW_SCANNET --output OUT \
        [--workers 16] [--frame-skip 1] [--tar]
"""
import argparse
import os
import sys
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export_scene(args_tuple):
    path, output, scene, frame_skip, use_tar = args_tuple
    from gennerf_tpu.data.prepare.sensor_data import SensorData

    folder, scene_name = scene.split("/")
    sens_file = os.path.join(path, folder, scene_name, scene_name + ".sens")
    if not os.path.exists(sens_file):
        print(f"missing {sens_file}, skipping")
        return scene
    out_dir = os.path.join(output, folder, scene_name)
    sd = SensorData(sens_file, archive_result=use_tar)
    sd.export_color_images(os.path.join(out_dir, "color"), frame_skip=frame_skip)
    sd.export_depth_images(os.path.join(out_dir, "depth"), frame_skip=frame_skip)
    sd.export_poses(os.path.join(out_dir, "poses"), frame_skip=frame_skip)
    sd.export_intrinsics(os.path.join(out_dir, "intrinsics"))
    # scene metadata txt for intrinsics parsing downstream
    K = sd.intrinsic_color
    with open(os.path.join(out_dir, scene_name + ".txt"), "w") as f:
        f.write(f"fx_color = {K[0, 0]}\nfy_color = {K[1, 1]}\n")
        f.write(f"mx_color = {K[0, 2]}\nmy_color = {K[1, 2]}\n")
        f.write(f"colorWidth = {sd.color_width}\ncolorHeight = {sd.color_height}\n")
        f.write(f"depthWidth = {sd.depth_width}\ndepthHeight = {sd.depth_height}\n")
    return scene


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", required=True, help="raw scannet root (scans/, scans_test/)")
    parser.add_argument("--output", required=True)
    parser.add_argument("--workers", type=int, default=16)
    parser.add_argument("--frame-skip", type=int, default=1)
    parser.add_argument("--tar", action="store_true", help="archive frames into tars")
    parser.add_argument("--i", type=int, default=0)
    parser.add_argument("--n", type=int, default=1)
    args = parser.parse_args(argv)

    scenes = []
    for folder in ("scans", "scans_test"):
        d = os.path.join(args.path, folder)
        if os.path.isdir(d):
            scenes += [os.path.join(folder, s) for s in sorted(os.listdir(d))]
    scenes = scenes[args.i :: args.n]

    jobs = [(args.path, args.output, s, args.frame_skip, args.tar) for s in scenes]
    if args.workers <= 1:
        for job in jobs:
            print("done", export_scene(job))
    else:
        with ProcessPoolExecutor(max_workers=args.workers) as pool:
            for scene in pool.map(export_scene, jobs):
                print("done", scene)


if __name__ == "__main__":
    main()
