#!/usr/bin/env python3
"""Batch-scaling + encode-throughput bench across model configurations.

VERDICT round-3 next #2/#4: the reference trains global batch 12
(/root/reference/configs/experiment/seqs_living_v2_cluster.yaml:25) and its
hot encode loop is the per-frame ResNet + backproject scatter
(/root/reference/src/models/utils.py:948-996, spatial_encoder.py:121-178).
This drives the shipped experiment presets' model configs through
make_task at B = 1/2/4/... and reports, per (model, B):

  * chained full-train-step ms (fwd+bwd+Adam, state threaded through reps,
    ONE host fetch per block — the tunnel-RTT-safe methodology, BENCH.md),
  * encode-only ms and frames/s (B*T frames per encode),
  * device memory high-water (HBM envelope for the B x C x nx*ny*nz
    volume accumulator risk named in SURVEY's hard parts).

Usage:
  python scripts/local/bench_batch_scaling.py \
      --models pointnet,spatial,pointnet_spatial,voxelnet --batches 1,2,4
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np

# experiment preset supplying each benched model config (the bench drives
# the SHIPPED configs, not hand-built ones)
MODEL_PRESETS = {
    "pointnet": "seqs_multigeo3_4cm",
    "spatial": "seq1_frames8_evenspaced_spatial",
    "pointnet_spatial": "seq1_frames8_evenspaced_pointnetspatial",
    "voxelnet": "seqs_multigeo_voxelnet",
}


def build_batch(task, B, T, H, W, rng):
    """Synthetic posed RGB-D batch shaped like the datamodule output.
    Content is random-but-valid (poses on a ring, positive depth) — step
    time does not depend on pixel values."""
    from gennerf_tpu.data.synthetic import look_at_pose

    cfg = task.cfg
    K = np.array([[0.6 * W, 0, W / 2], [0, 0.6 * W, H / 2], [0, 0, 1]], np.float32)
    projs, poses = [], []
    for i in range(T):
        a = 2 * np.pi * i / T
        pose = look_at_pose([2.2 * np.cos(a), 2.2 * np.sin(a), 1.3], [0, 0, 0.5])
        projs.append((K @ np.linalg.inv(pose)[:3]).astype(np.float32))
        poses.append(pose.astype(np.float32))
    depth = (rng.random((B, T, H, W), dtype=np.float32) * 2.0 + 0.5)
    image = rng.random((B, T, 3, H, W), dtype=np.float32)
    batch = {
        "projection": np.broadcast_to(np.stack(projs)[None], (B, T, 3, 4)).copy(),
        "image": image,
        "depth": depth,
        "pose": np.broadcast_to(np.stack(poses)[None], (B, T, 4, 4)).copy(),
        "intrinsics": np.broadcast_to(K[None, None], (B, T, 3, 3)).copy(),
    }
    # GT volume targets at every scale the task supervises
    voxel_sizes = getattr(task, "voxel_sizes", None) or [int(cfg.voxel_size * 100)]
    nx, ny, nz = cfg.voxel_dim_train
    for i, vs in enumerate(voxel_sizes):
        dims = (max(nx >> i, 1), max(ny >> i, 1), max(nz >> i, 1))
        batch["vol_%02d_tsdf" % vs] = rng.uniform(
            -1, 1, (B, 1) + dims).astype(np.float32)
    return batch


def device_peak_gb():
    import jax

    stats = getattr(jax.local_devices()[0], "memory_stats", lambda: None)()
    if not stats:
        return None
    peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
    return round(peak / 2**30, 3) if peak else None


def compiled_memory_gb(task, state, batch, key):
    """HBM envelope from XLA's own memory analysis of the compiled step
    (args + outputs + temps − donated aliases). The axon tunnel device does
    not expose runtime memory_stats, so this static analysis is the HBM
    high-water source on this harness; it is exactly the number the XLA
    allocator reserves, which is what determines max-B before OOM."""
    try:
        ma = task.train_step.lower(state, batch, key).compile().memory_analysis()
        total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
        return {
            "hbm_total_gb": round(total / 2**30, 3),
            "hbm_temp_gb": round(ma.temp_size_in_bytes / 2**30, 3),
            "hbm_args_gb": round(ma.argument_size_in_bytes / 2**30, 3),
        }
    except Exception:
        return None


def timeit_chained(first, step, n=3, rep=10):
    """min-of-n of rep chained executions, one host fetch per block."""
    carry = first()
    float(np.asarray(carry).sum())  # compile + warmup
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        carry = first()
        for _ in range(rep - 1):
            carry = step(carry)
        float(np.asarray(carry).sum())
        times.append((time.perf_counter() - t0) / rep)
    return min(times) * 1000.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--models", default="pointnet,spatial,pointnet_spatial,voxelnet")
    parser.add_argument("--batches", default="1,2,4")
    parser.add_argument("--frames", type=int, default=8)
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--precision", default=None,
                        help="override trainer.precision (default: preset's)")
    parser.add_argument("--remat", action="store_true",
                        help="force model.remat=true (the HBM mitigation "
                             "for the B*T folded 2D backbone activations)")
    parser.add_argument("--override", action="append", default=[],
                        help="extra config overrides, repeatable (e.g. "
                             "model.encoder.spatial.frame_chunk=1 "
                             "model.encoder.spatial.out_channels=64 — the "
                             "reference-style spatial memory mitigations)")
    parser.add_argument("--skip-step", action="store_true",
                        help="encode-only (skip the full train step)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache"))

    import jax.numpy as jnp

    from gennerf_tpu.train.tasks import make_task
    from gennerf_tpu.utils.config import compose

    config_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "configs")
    rng = np.random.default_rng(0)
    T, H, W = args.frames, args.height, args.width
    print(f"platform={jax.devices()[0].platform} T={T} {W}x{H}")

    for name in args.models.split(","):
        preset = MODEL_PRESETS[name.strip()]
        overrides = [f"experiment={preset}"]
        if args.remat:
            overrides.append("model.remat=true")
        overrides.extend(args.override)
        cfg = compose(config_dir, "train", overrides)
        precision = args.precision or cfg.get("trainer", {}).get("precision")
        task = make_task(cfg["model"], precision=precision)
        for B in [int(b) for b in args.batches.split(",")]:
            batch_np = build_batch(task, B, T, H, W, rng)
            key = jax.random.PRNGKey(0)
            batch = state0 = None
            try:
                # the device upload is INSIDE the try: after an OOM at the
                # previous B, leftover buffers can make even the host->HBM
                # transfer fail, and that must be a recorded row, not a crash
                batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
                state0 = task.init_state(jax.random.PRNGKey(1), batch)

                # encode-only timing: both model families expose encode()
                # (VoxelNet's = per-frame 2D backbone + backproject fold,
                # no rng; GenNerf's adds FPS/pointnet and takes a key)
                enc_ms = None
                if hasattr(task.model, "encode"):
                    model = task.model
                    is_gennerf = task.name == "GenNerf"

                    @jax.jit
                    def enc(params, batch_stats, img):
                        enc_args = (batch["projection"], img, batch["depth"])
                        if is_gennerf:
                            enc_args = enc_args + (key,)
                        repr_, _ = model.apply(
                            {"params": params, "batch_stats": batch_stats},
                            *enc_args,
                            tuple(task.cfg.voxel_dim_train), jnp.zeros(3),
                            train=True, method=type(model).encode,
                            mutable=["batch_stats"])
                        leaf = (getattr(repr_, "planes", None) or {}).get("xz") \
                            if getattr(repr_, "planes", None) is not None \
                            else repr_.volume
                        return leaf.astype(jnp.float32).sum()

                    enc_ms = timeit_chained(
                        lambda: enc(state0.params, state0.batch_stats, batch["image"]),
                        lambda c: enc(state0.params, state0.batch_stats,
                                      batch["image"] + c * 1e-20))

                step_ms = None
                if not args.skip_step:
                    holder = [state0]

                    def first():
                        holder[0] = state0
                        s, m = task.run_train_step(holder[0], batch, key)
                        holder[0] = s
                        return m["combined"] if "combined" in m else m["tsdf_loss"]

                    def nxt(c):
                        s, m = task.run_train_step(holder[0], batch, key)
                        holder[0] = s
                        return m["combined"] if "combined" in m else m["tsdf_loss"]

                    step_ms = timeit_chained(first, nxt)

                rec = {
                    "model": name, "preset": preset, "B": B, "T": T,
                    "precision": precision, "remat": bool(args.remat),
                    "overrides": args.override or None,
                    "encode_ms": None if enc_ms is None else round(enc_ms, 2),
                    "encode_frames_per_s": (
                        None if enc_ms is None
                        else round(B * T / (enc_ms / 1000.0), 1)),
                    "step_ms": None if step_ms is None else round(step_ms, 2),
                    "steps_per_s": (None if step_ms is None
                                    else round(1000.0 / step_ms, 2)),
                    "peak_hbm_gb": device_peak_gb(),
                }
                if rec["peak_hbm_gb"] is None and not args.skip_step:
                    rec.update(compiled_memory_gb(task, state0, batch, key) or {})
                print(json.dumps(rec), flush=True)
            except Exception as e:  # OOM/compile failure IS the measurement
                print(json.dumps({
                    "model": name, "B": B,
                    "remat": bool(args.remat), "precision": precision,
                    "overrides": args.override or None,
                    "error": f"{type(e).__name__}: {str(e)[:300]}"}), flush=True)
            finally:
                # release HBM before the next configuration: drop array refs
                # and the jit executable caches that pin donated buffers
                del batch, state0
                import gc

                gc.collect()
                try:
                    jax.clear_caches()
                except Exception:
                    pass


if __name__ == "__main__":
    main()
