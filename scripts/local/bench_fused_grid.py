#!/usr/bin/env python3
"""Compare dense-decode paths on the current accelerator:
XLA chunked decode vs the separable fused grid kernel."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache"))

    from __graft_entry__ import _flagship_cfg
    from gennerf_tpu.data.synthetic import render_scene, look_at_pose
    from gennerf_tpu.models import GenNerf
    from gennerf_tpu.models.gen_nerf import GenNerf as _G
    from gennerf_tpu.train.predict import (
        decode_dense, decode_grid_fused, dense_grid_points,
    )

    cfg = _flagship_cfg()
    model = GenNerf(cfg, dtype=jnp.bfloat16)

    H, W = 240, 320
    K = np.array([[0.6 * W, 0, W / 2], [0, 0.6 * W, H / 2], [0, 0, 1]], np.float32)
    projs, depths, images = [], [], []
    for i in range(8):
        a = 2 * np.pi * i / 8
        pose = look_at_pose([2.2 * np.cos(a), 2.2 * np.sin(a), 1.3], [0, 0, 0.5])
        depth, color = render_scene(H, W, K, pose)
        projs.append((K @ np.linalg.inv(pose)[:3]).astype(np.float32))
        depths.append(depth)
        images.append(color.transpose(2, 0, 1).astype(np.float32))
    proj = jnp.asarray(np.stack(projs))[None]
    depth = jnp.asarray(np.stack(depths))[None]
    image = jnp.asarray(np.stack(images))[None]

    key = jax.random.PRNGKey(0)
    xyz0 = jnp.zeros((1, 8, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), proj, image, depth, xyz0, key,
                           cfg.voxel_dim_val, jnp.zeros(3), train=False)
    repr_, _ = model.apply(variables, proj, image, depth, key, cfg.voxel_dim_val,
                           jnp.zeros(3), train=False, method=_G.encode,
                           mutable=["batch_stats"])
    jax.block_until_ready(repr_.planes["xz"])

    VOXEL_DIM = (256, 256, 96)
    n_pts = int(np.prod(VOXEL_DIM))
    origin = jnp.zeros(3, jnp.float32)
    pts = dense_grid_points(VOXEL_DIM, cfg.voxel_size, np.zeros(3))

    def timeit(name, fn):
        out = fn()
        float(out.sum())
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            float(out.sum())
            times.append(time.perf_counter() - t0)
        pps = n_pts / min(times)
        print(f"{name}: {min(times)*1000:.1f} ms -> {pps/1e6:.1f}M pts/s")
        return out, pps

    ref, _ = timeit("xla chunked 32k", lambda: decode_dense(
        model, variables, repr_, pts, origin, 32768))
    fused, _ = timeit("fused grid kernel", lambda: decode_grid_fused(
        model, variables, repr_, VOXEL_DIM, cfg.voxel_size, origin))

    d = np.abs(np.asarray(fused).ravel() - np.asarray(ref))
    print(f"abs diff vs xla: max {d.max():.4f} mean {d.mean():.6f}")
    c = np.corrcoef(np.asarray(fused).ravel(), np.asarray(ref))[0, 1]
    print(f"corr {c:.6f}")


if __name__ == "__main__":
    main()
