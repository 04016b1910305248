#!/usr/bin/env python3
"""Decompose the flagship training-step time on the current accelerator.

Times: full train step (fwd+bwd+Adam), forward loss alone, encode alone,
FPS alone, pointnet alone, supervision sampling alone, decode fwd alone.
Optionally writes a profiler trace (--trace DIR).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--trace", default=None)
    parser.add_argument("--frames", type=int, default=8)
    parser.add_argument("--precision", default="32-true",
                        help="trainer.precision surface: 32-true | bf16-mixed")
    parser.add_argument("--step-only", action="store_true",
                        help="measure just the full train step (for A/B runs)")
    parser.add_argument("--loss", default="tsdf",
                        choices=["tsdf", "eikonal", "gradient", "isdf",
                                 "distill"],
                        help="enable an extra loss term (eikonal/gradient "
                             "ride the single-forward vjp decode path; isdf "
                             "replaces tsdf; distill = render-mode semantic "
                             "distillation with the march inside the step) "
                             "for step-cost A/Bs "
                             "(reference model.py:360-430 loss modes)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache"))

    from __graft_entry__ import _flagship_cfg
    from gennerf_tpu.data.synthetic import render_scene, look_at_pose
    from gennerf_tpu.models import GenNerf
    from gennerf_tpu.models.gen_nerf import GenNerf as _G
    from gennerf_tpu.train.state import create_train_state, make_optimizer
    from gennerf_tpu.train.step import (
        gen_nerf_forward_loss,
        make_gen_nerf_train_step,
        sample_supervision_points,
    )

    from gennerf_tpu.train.tasks import dtype_for_precision

    cfg = _flagship_cfg()
    if args.loss != "tsdf":
        import dataclasses

        if args.loss == "distill":
            # render-mode distillation at the shipped preset's budget
            # (configs/experiment/distill_render_synthetic.yaml): the ray
            # march runs INSIDE the train step on the live decoded field
            cfg = dataclasses.replace(
                cfg,
                mlp=dataclasses.replace(cfg.mlp, d_out_sem=64),
                teacher=dataclasses.replace(
                    cfg.teacher, type="random_projection", feature_dim=64),
                loss=dataclasses.replace(
                    cfg.loss, use_distill=True,
                    distill=dataclasses.replace(
                        cfg.loss.distill, mode="render", render_rays=32,
                        render_far=4.0)))
        else:
            loss_overrides = {
                "eikonal": {"use_eikonal": True},
                "gradient": {"use_gradient": True},
                "isdf": {"use_isdf": True, "use_tsdf": False},
            }[args.loss]
            cfg = dataclasses.replace(
                cfg, loss=dataclasses.replace(cfg.loss, **loss_overrides))
    teacher = None
    if args.loss == "distill":
        from gennerf_tpu.models.teacher import make_teacher

        teacher = make_teacher(cfg.teacher)
    model = GenNerf(cfg, dtype=dtype_for_precision(args.precision),
                    teacher=teacher)
    print(f"precision={args.precision} loss={args.loss} "
          f"(compute dtype {model.dtype})")
    T = args.frames
    H, W = 480, 640
    K = np.array([[0.6 * W, 0, W / 2], [0, 0.6 * W, H / 2], [0, 0, 1]], np.float32)
    projs, depths, images, poses, intrs = [], [], [], [], []
    for i in range(T):
        a = 2 * np.pi * i / T
        pose = look_at_pose([2.2 * np.cos(a), 2.2 * np.sin(a), 1.3], [0, 0, 0.5])
        d, c = render_scene(H, W, K, pose)
        projs.append((K @ np.linalg.inv(pose)[:3]).astype(np.float32))
        depths.append(d)
        images.append(c.transpose(2, 0, 1).astype(np.float32))
        poses.append(pose.astype(np.float32))
        intrs.append(K)
    nx, ny, nz = cfg.voxel_dim_train
    batch = {
        "projection": np.stack(projs)[None],
        "image": np.stack(images)[None],
        "depth": np.stack(depths)[None],
        "pose": np.stack(poses)[None],
        "intrinsics": np.stack(intrs)[None],
        "vol_04_tsdf": np.random.default_rng(0).uniform(-1, 1, (1, 1, nx, ny, nz)).astype(np.float32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(0)

    variables = model.init(jax.random.PRNGKey(1), batch["projection"], batch["image"],
                           batch["depth"], jnp.zeros((1, 8, 3)), key,
                           tuple(cfg.voxel_dim_train), jnp.zeros(3), train=False)
    tx = make_optimizer(cfg.optimizer)
    state = create_train_state(variables, tx)
    train_step = make_gen_nerf_train_step(model, cfg, tx)

    def timeit(name, fn, n=3, rep=10):
        """Chained timing: iteration i+1's input is perturbed by iteration
        i's output (fn takes an eps scalar), so `rep` launches pipeline
        on-device and ONE host fetch amortizes the ~50 ms tunnel round
        trip. Unchained per-call timing over-reports small ops severalfold
        (BENCH.md measurement notes)."""
        e = fn(jnp.float32(0.0)).sum().astype(jnp.float32) * 1e-20
        float(e)  # compile + warmup
        times = []
        for _ in range(n):
            e = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(rep):
                e = fn(e).sum().astype(jnp.float32) * 1e-20
            float(e)
            times.append((time.perf_counter() - t0) / rep)
        print(f"{name:<42s} {min(times)*1000:8.1f} ms")

    def perturbed(eps):
        return dict(batch, image=batch["image"] + eps)

    # full step: thread the STATE through successive steps (the real
    # training pipeline), one fetch per rep block
    s_chain = [state]

    def step_once(eps):
        s2, m = train_step(s_chain[0], perturbed(eps), key)
        s_chain[0] = s2
        return m["combined"]

    s_chain[0] = state
    timeit("train step (fwd+bwd+Adam)", step_once)
    s_chain[0] = state
    if args.step_only:
        return

    # forward loss only
    @jax.jit
    def fwd(params, batch, key):
        loss, _, _ = gen_nerf_forward_loss(
            model, cfg, params, state.batch_stats, batch, key,
            tuple(cfg.voxel_dim_train), train=True)
        return loss

    timeit("forward loss", lambda eps: fwd(state.params, perturbed(eps), key))

    # encode only
    @jax.jit
    def enc(params, batch, key):
        repr_, _ = model.apply({"params": params, "batch_stats": state.batch_stats},
                               batch["projection"], batch["image"], batch["depth"],
                               key, tuple(cfg.voxel_dim_train), jnp.zeros(3),
                               train=True, method=_G.encode, mutable=["batch_stats"])
        return repr_.planes["xz"]

    timeit("encode (FPS + pointnet + unet)", lambda eps: enc(state.params, perturbed(eps), key))

    # FPS alone (with presample)
    from gennerf_tpu.ops.projection import get_3d_points
    from gennerf_tpu.ops.sampling import farthest_point_sample

    @jax.jit
    def fps_only(batch, key):
        B, T_, H_, W_ = batch["depth"].shape
        xyz = get_3d_points(batch["depth"].reshape(B * T_, H_, W_),
                            batch["projection"].reshape(B * T_, 3, 4)).reshape(B * T_, -1, 3)
        pre = cfg.encoder.pointnet.fps_presample
        if pre and xyz.shape[1] > pre:
            k1, key = jax.random.split(key)
            sel = jax.random.randint(k1, (xyz.shape[0], pre), 0, xyz.shape[1])
            xyz = jnp.take_along_axis(xyz, sel[..., None], axis=1)
        sparse, _ = farthest_point_sample(key, xyz, cfg.encoder.pointnet.num_sparse_points)
        return sparse

    timeit("unproject + presample + FPS", lambda eps: fps_only(perturbed(eps), key))
    sparse = fps_only(batch, key)

    @jax.jit
    def pointnet_only(params, sparse):
        B = 1
        accum = sparse.reshape(B, -1, 3)
        return model.apply({"params": params, "batch_stats": state.batch_stats},
                           accum, method=lambda m, p: m.pointnet(p))["xz"]

    timeit("pointnet + unet (given sparse pts)", lambda eps: pointnet_only(state.params, sparse + eps))

    @jax.jit
    def sampling_only(batch, key):
        sup = sample_supervision_points(cfg, batch, key)
        return sup["xyz"]

    timeit("supervision sampling (rays+normals)", lambda eps: sampling_only(perturbed(eps), key))

    # decode fwd only at training point count
    @jax.jit
    def decode_only(params, batch, key):
        repr_, _ = model.apply({"params": params, "batch_stats": state.batch_stats},
                               batch["projection"], batch["image"], batch["depth"],
                               key, tuple(cfg.voxel_dim_train), jnp.zeros(3),
                               train=True, method=_G.encode, mutable=["batch_stats"])
        sup = sample_supervision_points(cfg, batch, key)
        B = 1
        xyz = sup["xyz"].reshape(B, -1, 3)
        out = model.apply({"params": params, "batch_stats": state.batch_stats},
                          repr_, xyz, jnp.zeros(3), method=_G.decode)
        return out["tsdf"]

    timeit("encode + sampling + decode (no loss/bwd)", lambda eps: decode_only(state.params, perturbed(eps), key))

    if args.trace:
        jax.profiler.start_trace(args.trace)
        for _ in range(3):
            _, m = train_step(state, batch, key)
            float(np.asarray(m["combined"]))
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
