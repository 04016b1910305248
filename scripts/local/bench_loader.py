#!/usr/bin/env python3
"""Input-pipeline throughput on reference-shaped data: 640x480 jpg+png
frames in tar archives, 8 frames/item, full train transform chain
(resize + RandomTransformSpace + TSDF resample + collate).

Done-criterion (VERDICT round-1 #6): loader >= 2x the train step rate
(3.97 steps/s flagship)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tempfile

    from gennerf_tpu.data.datamodule import ScannetDataModule
    from gennerf_tpu.data.synthetic import generate_scene

    root = tempfile.mkdtemp(prefix="loader_bench_")
    print("generating synthetic 640x480 tar scene...")
    generate_scene(root, num_frames=48, H=480, W=640, voxel_sizes=(4, 8, 16),
                   use_tar=True)

    cfg = {
        "data_dir": root,
        "datasets_train": ["scans/scene_synth0/info.json"],
        "datasets_val": ["scans/scene_synth0/info.json"],
        "datasets_test": ["scans/scene_synth0/info.json"],
        "dataset_type": "sequences",
        "sequence_amount_train": 1.0, "sequence_amount_val": 1.0,
        "sequence_amount_test": 1.0,
        "sequence_length": 8, "sequence_locations": "free",
        "sequence_order": "random",
        "num_frames_train": 8, "num_frames_val": 8, "num_frames_test": 8,
        "frame_locations": "evenly_spaced", "frame_order": "random",
        "batch_size": 1, "voxel_size": 0.04,
        "voxel_dim_train": [96, 96, 48], "voxel_dim_val": [96, 96, 48],
        "voxel_dim_test": [96, 96, 48],
        "voxel_types": ["tsdf"], "from_archive": True,
        "random_rotation_3d": True, "random_translation_3d": True,
    }

    for workers in (0, 1, 4, 8):
        cfg["num_workers"] = workers
        dm = ScannetDataModule(cfg)
        loader = dm.train_dataloader()
        # warmup one epoch to populate page cache
        n = 0
        for _ in loader:
            n += 1
        t0 = time.perf_counter()
        epochs = 3
        for _ in range(epochs):
            for _ in loader:
                pass
        dt = time.perf_counter() - t0
        rate = epochs * n / dt
        print(f"num_workers={workers}: {rate:.2f} batches/s "
              f"({rate * 8:.1f} frames/s) over {epochs}x{n} batches")


if __name__ == "__main__":
    main()
