#!/usr/bin/env python3
"""Unpack exported per-scene archives to (node-local) working storage.

Reference: scripts/build_scannet.py — after read_scannet exports tar'd
frames, this materializes the per-frame files on fast local disk (the
from_archive=False layout), with a process pool over scenes.

Usage:
    python scripts/build_scannet.py --source EXPORT --target LOCAL [--workers 16]
"""
import argparse
import os
import shutil
import sys
import tarfile
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_scene(args_tuple):
    source, target, scene = args_tuple
    src_dir = os.path.join(source, scene)
    dst_dir = os.path.join(target, scene)
    os.makedirs(dst_dir, exist_ok=True)
    for name in os.listdir(src_dir):
        src = os.path.join(src_dir, name)
        dst = os.path.join(dst_dir, name)
        if os.path.isdir(src):
            os.makedirs(dst, exist_ok=True)
            for fn in os.listdir(src):
                p = os.path.join(src, fn)
                if fn.endswith(".tar"):
                    with tarfile.open(p) as tar:
                        tar.extractall(dst)
                else:
                    shutil.copy2(p, os.path.join(dst, fn))
        elif not os.path.exists(dst):
            shutil.copy2(src, dst)
    return scene


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--source", required=True)
    parser.add_argument("--target", required=True)
    parser.add_argument("--workers", type=int, default=16)
    parser.add_argument("--i", type=int, default=0)
    parser.add_argument("--n", type=int, default=1)
    args = parser.parse_args(argv)

    scenes = []
    for folder in ("scans", "scans_test"):
        d = os.path.join(args.source, folder)
        if os.path.isdir(d):
            scenes += [os.path.join(folder, s) for s in sorted(os.listdir(d))]
    scenes = scenes[args.i :: args.n]
    jobs = [(args.source, args.target, s) for s in scenes]
    if args.workers <= 1:
        for job in jobs:
            print("built", build_scene(job))
    else:
        with ProcessPoolExecutor(max_workers=args.workers) as pool:
            for scene in pool.map(build_scene, jobs):
                print("built", scene)


if __name__ == "__main__":
    main()
