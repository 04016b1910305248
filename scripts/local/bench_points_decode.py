#!/usr/bin/env python3
"""Arbitrary-point decode benchmark (VERDICT round-2 missing #4).

Measures, on the current accelerator, chained/amortized (BENCH.md
methodology — one accumulated scalar fetch per REP-decode trial):
  1. decode_dense (chunked XLA gather tier) on shuffled arbitrary points;
  2. the fused point path (make_point_tsdf_fn: bf16 triplane gathers + PE
     in XLA -> one Pallas ResnetFC/TSDF launch), tile sweep;
  3. the XLA feature+PE stage alone (the fused path's non-kernel bound);
  4. SurfaceRenderer 240x320 depth image: plain vs fused march.

Usage: python scripts/local/bench_points_decode.py [--quick]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--n", type=int, default=1 << 21)
    parser.add_argument("--stage", default="all",
                        choices=["all", "points", "renderer"])
    parser.add_argument("--tiles", type=int, nargs="+", default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache"),
    )
    from __graft_entry__ import _flagship_cfg
    from gennerf_tpu.data.synthetic import look_at_pose, render_scene
    from gennerf_tpu.models import GenNerf
    from gennerf_tpu.models.gen_nerf import GenNerf as _G
    from gennerf_tpu.models.positional_encoding import positional_encoding
    from gennerf_tpu.models.renderer import SurfaceRenderer
    from gennerf_tpu.train.predict import decode_dense, make_point_tsdf_fn

    platform = jax.devices()[0].platform
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

    N = args.n
    rng = np.random.default_rng(0)
    pts_np = rng.uniform(-0.5, 0.5, (1, N, 3)).astype(np.float32)
    pts = jnp.asarray(pts_np)
    origin = jnp.zeros(3, jnp.float32)
    REP = 3 if args.quick else 10
    results = {}

    def timed(name, fn, n_items):
        out = fn()
        float(out.sum()) if hasattr(out, "sum") else None
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            acc = 0.0
            for _ in range(REP):
                acc = acc + fn().sum()
            float(acc)
            times.append((time.perf_counter() - t0) / REP)
        rate = n_items / min(times)
        results[name] = {"sec": min(times), "per_sec": rate}
        print(f"{name}: {min(times)*1e3:.1f} ms = {rate/1e6:.1f}M/s", flush=True)
        return rate

    do_points = args.stage in ("all", "points")
    do_renderer = args.stage in ("all", "renderer")
    # 1. baseline gather tier
    if do_points:
        timed("decode_dense (gather tier)",
              lambda: decode_dense(model, variables, repr_, pts[0], origin, 32768), N)

        # 3. feature+PE stage alone
        @jax.jit
        def feat_stage(p):
            feat = model.apply(variables, repr_, p, origin, method=_G.map_features)
            code = positional_encoding(p.reshape(-1, 3), cfg.code.num_freqs,
                                       cfg.code.freq_factor, cfg.code.include_input)
            return feat.sum() + code.sum()

        timed("feature+PE stage (XLA)", lambda: feat_stage(pts), N)

        # 3b. the fast channels-last batched gather + its XLA-MLP variant
        from gennerf_tpu.train.predict import (
            _triplane_feat_fast,
            _triplane_gather_setup,
        )

        flat, reso, padding, center, scale = _triplane_gather_setup(
            model, repr_.planes)

        @jax.jit
        def feat_fast(p):
            feat = _triplane_feat_fast(flat, reso, padding, center, scale, p)
            code = positional_encoding(p.reshape(-1, 3), cfg.code.num_freqs,
                                       cfg.code.freq_factor, cfg.code.include_input)
            return feat.sum() + code.sum()

        timed("feature+PE stage (fast gather)", lambda: feat_fast(pts), N)

        d_geo = cfg.mlp.d_out_geo

        @jax.jit
        def fast_gather_xla_mlp(p):
            B, Np, _ = p.shape
            feat = _triplane_feat_fast(flat, reso, padding, center, scale, p)
            code = positional_encoding(p.reshape(-1, 3), cfg.code.num_freqs,
                                       cfg.code.freq_factor, cfg.code.include_input)
            mlp_in = jnp.concatenate([code.reshape(B, Np, -1), feat], -1)
            return model.apply(
                variables, mlp_in,
                method=lambda m, x: m.head_geo(m.mlp(x)[..., :d_geo]))

        timed("fast gather + XLA MLP", lambda: fast_gather_xla_mlp(pts), N)

        # 2. fused point path, tile sweep
        tiles = args.tiles or ((2048,) if args.quick else (1024, 2048, 4096))
        for tile in tiles:
            try:
                fn = make_point_tsdf_fn(model, variables, repr_, origin, tile=tile)
                timed(f"fused point decode (tile {tile})", lambda: fn(pts), N)
            except Exception as e:
                print(f"fused tile {tile}: {type(e).__name__}: {e}", flush=True)

    # 4. renderer
    if not do_renderer:
        print(json.dumps({"platform": platform, "n_points": N, **{
            k: {kk: round(vv, 6) for kk, vv in v.items()} for k, v in results.items()
        }}))
        return
    def decode_fn(p):
        return model.apply(variables, repr_, p, origin, method=_G.decode)

    Kj = jnp.asarray(K)[None]
    pose_j = jnp.asarray(look_at_pose([2.2, 0.0, 1.3], [0, 0, 0.5]).astype(np.float32))[None]
    n_rays = H * W
    # chunked field evaluator: the march batches are large (R*S points) and
    # an unchunked MLP thrashes HBM with full-size activations; decode_dense
    # keeps them 32k-chunked (measured 24.4M vs 13.8M pts/s unchunked)
    def tsdf_chunked(p):
        B, Np, _ = p.shape
        return decode_dense(model, variables, repr_, p.reshape(-1, 3), origin,
                            32768).reshape(B, Np)

    for name, kwargs in (
        ("renderer 64-step (round-2 baseline)",
         dict(n_steps=64, n_secant_steps=8, n_max_network_queries=262144)),
        ("renderer hier 16+8",
         dict(n_steps=16, n_fine_steps=8, n_secant_steps=8,
              n_max_network_queries=786432)),
        ("renderer hier 16+8 chunked",
         dict(n_steps=16, n_fine_steps=8, n_secant_steps=8,
              n_max_network_queries=786432, tsdf_fn=tsdf_chunked)),
        ("renderer hier 16+8 chunked secant4",
         dict(n_steps=16, n_fine_steps=8, n_secant_steps=4,
              n_max_network_queries=786432, tsdf_fn=tsdf_chunked)),
    ):
        r = SurfaceRenderer(decode_fn, near=0.5, far=4.5, **kwargs)
        render = jax.jit(lambda: r.render_depth_image(Kj, pose_j, H, W))
        out = render()
        float(out.sum())
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            acc = 0.0
            for _ in range(REP):
                acc = acc + render().sum()
            float(acc)
            times.append((time.perf_counter() - t0) / REP)
        rate = n_rays / min(times)
        results[name] = {"sec": min(times), "rays_per_sec": rate}
        print(f"{name}: {min(times)*1e3:.1f} ms = {rate/1e6:.3f}M rays/s", flush=True)

    print(json.dumps({"platform": platform, "n_points": N, **{
        k: {kk: round(vv, 6) for kk, vv in v.items()} for k, v in results.items()
    }}))


if __name__ == "__main__":
    main()
