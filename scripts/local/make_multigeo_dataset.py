#!/usr/bin/env python3
"""Generate the multi-geometry synthetic dataset for the 4 cm quality drive
(VERDICT round-2 next #5): N training scenes cycled over the requested
geometry families (spheres/boxes/cylinders) plus one held-out scene per
family, fused at 4+8 cm. Default families preserve the round-3 benchmarked
2-family protocol exactly (seed stream unchanged).

Runs CPU-forced (scene generation is eager host work; on the axon platform
it would dispatch per-op through the TPU tunnel).

Usage: python scripts/local/make_multigeo_dataset.py --out DIR
       [--train 8] [--frames 10] [--height 120] [--width 160]
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--train", type=int, default=8)
    parser.add_argument("--frames", type=int, default=10)
    parser.add_argument("--height", type=int, default=120)
    parser.add_argument("--width", type=int, default=160)
    parser.add_argument("--voxel-sizes", type=int, nargs="+", default=[4, 8])
    parser.add_argument("--families", default="spheres,boxes",
                        help="comma list of geometry families to cycle "
                             "(spheres|boxes|cylinders|rooms — rooms is the "
                             "ScanNet-like indoor regime: wall shell viewed "
                             "from inside + furniture); default preserves "
                             "the round-3 benchmarked 2-family protocol")
    args = parser.parse_args(argv)
    families = args.families.split(",")

    from gennerf_tpu.data.synthetic import generate_scene, random_primitives

    rng = np.random.default_rng(0)
    train_infos, val_infos = [], []
    for i in range(args.train):
        family = families[i % len(families)]
        prims = random_primitives(rng, family)
        info = generate_scene(
            args.out, scene=f"scene_{family[:-1]}{i}", num_frames=args.frames,
            H=args.height, W=args.width, voxel_sizes=tuple(args.voxel_sizes),
            primitives=prims, seed=i,
        )
        train_infos.append(os.path.relpath(info, args.out))
        print("train:", info, flush=True)
    for fi, family in enumerate(families):
        prims = random_primitives(rng, family)
        info = generate_scene(
            args.out, scene=f"scene_heldout_{family[:-1]}", num_frames=args.frames,
            H=args.height, W=args.width, voxel_sizes=tuple(args.voxel_sizes),
            primitives=prims, seed=100 + fi,
        )
        val_infos.append(os.path.relpath(info, args.out))
        print("heldout:", info, flush=True)

    splits = {"train": train_infos, "val": val_infos}
    with open(os.path.join(args.out, "splits.json"), "w") as f:
        json.dump(splits, f, indent=2)
    # split .txt files (parse_splits_list surface)
    with open(os.path.join(args.out, "train.txt"), "w") as f:
        f.write("\n".join(train_infos) + "\n")
    with open(os.path.join(args.out, "val.txt"), "w") as f:
        f.write("\n".join(val_infos) + "\n")
    print("splits at", os.path.join(args.out, "{train,val}.txt"))


if __name__ == "__main__":
    main()
