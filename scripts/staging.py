#!/usr/bin/env python3
"""Stage a prepared dataset to fast node-local storage.

Reference: scripts/staging.py — copy/untar scene data into $TMPDIR (or any
target) and rewrite the info.json frame paths to the staged location so
training reads from local disk.

Usage:
    python scripts/staging.py --splits scannet_train.txt --source DATA \
        --target $TMPDIR/scannet [--workers 8] [--untar]
"""
import argparse
import json
import os
import shutil
import sys
import tarfile
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage_scene(args_tuple):
    info_file, source, target, untar = args_tuple
    with open(info_file) as f:
        info = json.load(f)
    scene = info["scene"]
    rel = os.path.relpath(os.path.dirname(info_file), source)
    dst_dir = os.path.join(target, rel)
    os.makedirs(dst_dir, exist_ok=True)

    src_dir = os.path.dirname(info_file)
    for name in os.listdir(src_dir):
        src = os.path.join(src_dir, name)
        dst = os.path.join(dst_dir, name)
        if os.path.isdir(src):
            os.makedirs(dst, exist_ok=True)
            for fn in os.listdir(src):
                if fn.endswith(".tar") and untar:
                    with tarfile.open(os.path.join(src, fn)) as tar:
                        tar.extractall(dst)
                else:
                    shutil.copy2(os.path.join(src, fn), os.path.join(dst, fn))
        elif not os.path.exists(dst):
            shutil.copy2(src, dst)

    # rewrite paths in the staged info.json
    def retarget(p):
        return p.replace(source.rstrip("/"), target.rstrip("/")) if isinstance(p, str) else p

    staged = json.loads(json.dumps(info))
    for key in list(staged.keys()):
        if key.startswith("file_name"):
            staged[key] = retarget(staged[key])
    for frame in staged["frames"]:
        for key in list(frame.keys()):
            if key.startswith("file_name"):
                frame[key] = retarget(frame[key])
    with open(os.path.join(dst_dir, "info.json"), "w") as f:
        json.dump(staged, f)
    return scene


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--splits", required=True, nargs="+",
                        help="split .txt files (lists of info.json paths)")
    parser.add_argument("--source", required=True)
    parser.add_argument("--target", required=True)
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--untar", action="store_true")
    args = parser.parse_args(argv)

    info_files = []
    for split in args.splits:
        path = split if os.path.exists(split) else os.path.join(args.source, split)
        with open(path) as f:
            info_files += [line.strip() for line in f if line.strip()]
        # stage the split file itself, retargeted
        out_split = os.path.join(args.target, os.path.basename(split))
        os.makedirs(args.target, exist_ok=True)
        with open(out_split, "w") as f:
            for line in info_files:
                f.write(line.replace(args.source.rstrip("/"), args.target.rstrip("/")) + "\n")

    jobs = [(p, args.source, args.target, args.untar) for p in sorted(set(info_files))]
    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        for scene in pool.map(stage_scene, jobs):
            print("staged", scene)


if __name__ == "__main__":
    main()
