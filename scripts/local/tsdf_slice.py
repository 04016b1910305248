#!/usr/bin/env python3
"""Plot z-slices of predicted vs target TSDF volumes.

Reference: scripts/local/tsdf_slice.py (interactive matplotlib). Saves a
PNG grid instead (headless-friendly).

Usage: python scripts/local/tsdf_slice.py --pred P.npz --trgt T.npz [--out slices.png]
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
    parser.add_argument("--pred", required=True)
    parser.add_argument("--trgt", required=True)
    parser.add_argument("--out", default="tsdf_slices.png")
    parser.add_argument("--num-slices", type=int, default=6)
    args = parser.parse_args(argv)

    from gennerf_tpu.tsdf import TSDF

    pred = np.asarray(TSDF.load(args.pred).tsdf_vol)
    trgt = np.asarray(TSDF.load(args.trgt).tsdf_vol)
    nz = min(pred.shape[2], trgt.shape[2])
    zs = np.linspace(0, nz - 1, args.num_slices, dtype=int)

    fig, axes = plt.subplots(3, len(zs), figsize=(3 * len(zs), 9))
    for j, z in enumerate(zs):
        for row, (vol, title) in enumerate([(pred, "pred"), (trgt, "target")]):
            ax = axes[row, j]
            ax.imshow(vol[:, :, z].T, cmap="RdBu", vmin=-1, vmax=1, origin="lower")
            ax.set_title(f"{title} z={z}")
            ax.axis("off")
        ax = axes[2, j]
        ax.imshow(np.abs(pred[:, :, z] - trgt[:, :, z]).T, cmap="magma", vmin=0, vmax=1, origin="lower")
        ax.set_title(f"|diff| z={z}")
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
