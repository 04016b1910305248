"""Pallas farthest-point sampling: the whole sequential loop in one kernel.

The XLA `farthest_point_sample` (ops/sampling.py) runs its 512 inherently
sequential iterations as a `lax.fori_loop` of small ops — on v5e the loop
costs ~23 ms for (8, 4096) points, 64% of the FPS-parity training step
(BENCH.md round-2 profile), dominated by per-iteration overhead rather
than arithmetic. This kernel keeps the point cloud VMEM-resident and runs
the entire loop inside ONE Mosaic program.

Mosaic constraints shape the formulation (in-kernel gathers are
unsupported on this toolchain — BENCH.md probe log):
- the selected centroid is extracted with a one-hot masked reduction
  instead of a dynamic gather;
- argmax is emulated as max + first-index-of-max (matching jnp.argmax's
  first-occurrence tie-breaking, so indices are IDENTICAL to the XLA
  reference);
- per-iteration output lands via `iteration == i` one-hot accumulation
  instead of a dynamic store.

Layout: points arrive coordinate-major (3, B, N) so the hot (B, N)
arrays put N on lanes; B rides the sublanes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(xyz_ref, start_ref, out_ref, *, npoint: int):
    B, N = xyz_ref.shape[1], xyz_ref.shape[2]
    f32 = jnp.float32
    x = xyz_ref[0]
    y = xyz_ref[1]
    z = xyz_ref[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, npoint), 1)
    far0 = start_ref[:, :1]  # (B, 1) int32 (column 0 of the padded tile)

    def body(i, carry):
        dist, far, out = carry
        # out[:, i] = far  (one-hot accumulate; out starts at 0)
        out = out + far * (col == i).astype(jnp.int32)
        # centroid = xyz[far] via masked reduction (no in-kernel gather)
        onehot = (lane == far).astype(f32)
        cx = jnp.sum(onehot * x, axis=-1, keepdims=True)
        cy = jnp.sum(onehot * y, axis=-1, keepdims=True)
        cz = jnp.sum(onehot * z, axis=-1, keepdims=True)
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        dist = jnp.minimum(dist, d)
        # argmax with first-occurrence ties (jnp.argmax semantics)
        m = jnp.max(dist, axis=-1, keepdims=True)
        far = jnp.min(jnp.where(dist == m, lane, N), axis=-1, keepdims=True)
        return dist, far, out

    init = (
        jnp.full((B, N), 1e10, f32),
        far0,
        jnp.zeros((B, npoint), jnp.int32),
    )
    _, _, out = jax.lax.fori_loop(0, npoint, body, init)
    out_ref[:, :] = out


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def fps_pallas(key, xyz: jnp.ndarray, npoint: int, interpret: bool = False):
    """Drop-in equivalent of ops.sampling.farthest_point_sample.

    Args:
        xyz: (B, N, 3) float32; N must be a multiple of 128 and B a
            multiple of 8 for the TPU layout (callers fall back to the
            XLA loop otherwise — see sampling.farthest_point_sample).
        npoint: static sample count.

    Returns:
        (sampled_xyz (B, npoint, 3), centroids (B, npoint) int32) with
        indices identical to the XLA implementation.
    """
    B, N, _ = xyz.shape
    farthest0 = jax.random.randint(key, (B,), 0, N).astype(jnp.int32)
    start = jnp.zeros((B, 128), jnp.int32).at[:, 0].set(farthest0)
    xyz_t = xyz.transpose(2, 0, 1).astype(jnp.float32)  # (3, B, N)
    centroids = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint),
        out_shape=jax.ShapeDtypeStruct((B, npoint), jnp.int32),
        in_specs=[
            pl.BlockSpec((3, B, N), lambda: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 128), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, npoint), lambda: (0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xyz_t, start)
    sampled = jnp.take_along_axis(xyz, centroids[..., None].astype(jnp.int32), axis=1)
    return sampled, centroids


def fps_pallas_supported(B: int, N: int, npoint: int = 128) -> bool:
    """TPU layout constraints for the kernel: (B, N) and the (B, npoint)
    output tile on (8, 128), and the resident working set (~6 B·N f32
    arrays) within VMEM. Unaligned npoint falls back to the XLA loop —
    only the flagship-style 128-multiples are validated on hardware.

    The B*N bound is STRICT: at exactly B*N = 1<<19 (observed at batch
    B=4, BT=32 frames x 16384 presample) the remote Mosaic toolchain
    crashes outright (tpu_compile_helper exit 1 — the round-4
    'deterministic B=4 compile crash', root-caused round 5 by bisecting
    with GENNERF_FPS_PALLAS=0: the same step compiles and runs on the
    XLA FPS path at 41.7 ms). B*N = 3<<17 (BT=24) compiles and runs."""
    return (
        B % 8 == 0
        and 128 <= N <= 32768
        and N % 128 == 0
        and B * N < 1 << 19
        and npoint % 128 == 0
    )
