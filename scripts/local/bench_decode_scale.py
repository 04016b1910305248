#!/usr/bin/env python3
"""Decode-throughput bench at arbitrary grid scales + sparse-band timing.

VERDICT round-3 next #3: every decode bench so far ran the repo's val grid
256x256x96 (~6.3M pts); the reference's DEFAULT inference grid is
416x416x128 (~22.2M pts, /root/reference/configs/data/default.yaml:26-28).
This drives the production tier stack (pallas grid kernel -> separable XLA
-> chunked gather) at a requested grid and, optionally, times the
prior-first sparse band decode (predict_tsdf_volume_sparse) against
dense + fusion-prior clamp on the same encoded scene.

One grid per invocation (each new kernel shape is a fresh multi-minute
remote Mosaic compile through the tunnel — sweep via separate runs):

  python scripts/local/bench_decode_scale.py --dims 416,416,128
  python scripts/local/bench_decode_scale.py --dims 416,416,128 --sparse
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dims", default="416,416,128")
    parser.add_argument("--tier", default="auto",
                        choices=["auto", "pallas", "separable", "gather"])
    parser.add_argument("--sparse", action="store_true",
                        help="also time predict_tsdf_volume_sparse vs dense+prior")
    parser.add_argument("--reps", type=int, default=None)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache"))

    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from gennerf_tpu.data.synthetic import look_at_pose, render_scene
    from gennerf_tpu.models import GenNerf
    from gennerf_tpu.models.gen_nerf import GenNerf as _G
    from gennerf_tpu.train.predict import (
        decode_dense,
        decode_grid_fused,
        decode_grid_separable_xla,
        dense_grid_points,
        predict_tsdf_volume_sparse,
    )
    from gennerf_tpu.tsdf.fusion import apply_fusion_prior

    platform = jax.devices()[0].platform
    dims = tuple(int(d) for d in args.dims.split(","))
    n_pts = int(np.prod(dims))
    cfg = _flagship_cfg()
    model = GenNerf(cfg, dtype=jnp.bfloat16)

    # encode a synthetic 8-frame scene (setup, not measured)
    H, W = 240, 320
    K = np.array([[0.6 * W, 0, W / 2], [0, 0.6 * W, H / 2], [0, 0, 1]], np.float32)
    projs, depths, images = [], [], []
    for i in range(8):
        a = 2 * np.pi * i / 8
        pose = look_at_pose([2.2 * np.cos(a), 2.2 * np.sin(a), 1.3], [0, 0, 0.5])
        d, c = render_scene(H, W, K, pose)
        projs.append((K @ np.linalg.inv(pose)[:3]).astype(np.float32))
        depths.append(d)
        images.append(c.transpose(2, 0, 1).astype(np.float32))
    proj = jnp.asarray(np.stack(projs))[None]
    depth = jnp.asarray(np.stack(depths))[None]
    image = jnp.asarray(np.stack(images))[None]
    key = jax.random.PRNGKey(0)
    variables = model.init(jax.random.PRNGKey(1), proj, image, depth,
                           jnp.zeros((1, 8, 3)), key, cfg.voxel_dim_val,
                           jnp.zeros(3), train=False)
    repr_, _ = model.apply(variables, proj, image, depth, key,
                           cfg.voxel_dim_val, jnp.zeros(3), train=False,
                           method=_G.encode, mutable=["batch_stats"])
    jax.block_until_ready(repr_.planes["xz"])
    # the scene volume is ~4m; keep the grid span comparable regardless of
    # dims so band sizes are scene-typical for the sparse comparison
    voxel_size = cfg.voxel_size
    origin = jnp.asarray([-dims[0] * voxel_size / 2,
                          -dims[1] * voxel_size / 2, -0.6], jnp.float32)

    tiers = {
        "pallas": lambda: decode_grid_fused(
            model, variables, repr_, dims, voxel_size, origin),
        "separable": lambda: decode_grid_separable_xla(
            model, variables, repr_, dims, voxel_size, origin),
    }
    _pts = []

    def _gather():
        if not _pts:
            _pts.append(dense_grid_points(dims, voxel_size, np.asarray(origin)))
        return decode_dense(model, variables, repr_, _pts[0], origin, 32768)

    tiers["gather"] = _gather

    order = ([args.tier] if args.tier != "auto"
             else ["pallas", "separable", "gather"])
    tsdf, used = None, None
    for name in order:
        try:
            t0 = time.perf_counter()
            tsdf = tiers[name]()
            float(tsdf.astype(jnp.float32).sum())
            compile_s = time.perf_counter() - t0
            used = name
            break
        except NotImplementedError as e:
            print(json.dumps({"tier": name, "dims": dims,
                              "ineligible": str(e)[:200]}), flush=True)
        except Exception as e:
            print(json.dumps({"tier": name, "dims": dims,
                              "error": f"{type(e).__name__}: {str(e)[:300]}"}),
                  flush=True)
    if tsdf is None:
        print(json.dumps({"dims": dims, "error": "no tier succeeded"}))
        return 1

    on_tpu = platform == "tpu"
    REP = args.reps or (6 if on_tpu else 1)
    decode = tiers[used]
    times = []
    for _ in range(3 if on_tpu else 1):
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(REP):
            acc = acc + decode().astype(jnp.float32).sum()
        float(acc)
        times.append((time.perf_counter() - t0) / REP)
    pps = n_pts / min(times)
    print(json.dumps({
        "metric": "dense decode", "platform": platform, "tier": used,
        "dims": dims, "points": n_pts,
        "mpts_per_s": round(pps / 1e6, 1),
        "ms_per_volume": round(min(times) * 1000, 1),
        "first_call_s": round(compile_s, 1),
    }), flush=True)

    if args.sparse:
        projT = proj[0]
        depthT = depth[0]

        def dense_plus_prior():
            vol = decode().reshape(dims)
            vol = apply_fusion_prior(vol, voxel_size, origin, projT, depthT)
            return float(vol.astype(jnp.float32).sum())

        def sparse_band():
            vol = predict_tsdf_volume_sparse(
                model, variables, repr_, dims, voxel_size, origin,
                projT, depthT)
            return float(vol.astype(jnp.float32).sum())

        for name, fn in (("dense+prior", dense_plus_prior),
                         ("sparse-band", sparse_band)):
            fn()  # compile + warmup (incl. host-side nonzero path)
            ts = []
            for _ in range(3 if on_tpu else 1):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            print(json.dumps({
                "metric": "volume reconstruct (prior-masked)",
                "path": name, "dims": dims,
                "s_per_volume": round(min(ts), 3),
                "effective_mpts_per_s": round(n_pts / min(ts) / 1e6, 1),
            }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
