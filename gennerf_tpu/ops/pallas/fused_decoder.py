"""Fused ResnetFC TSDF decoder kernel.

The dense-decode hot path (SURVEY §3 hot loop #1). The XLA version writes
every Dense intermediate — ~14 (N, 256) tensors — back to HBM, making the
decoder HBM-bound at ~10% MXU utilization. This kernel streams point tiles
through the ENTIRE decoder (lin_in -> n_blocks x [latent-inject + 2-layer
residual block] -> lin_out -> tanh head) inside VMEM: per tile, only the
(TILE, d_in+d_code) inputs are read and (TILE,) TSDF values written.

Weights (~3 MB for the flagship d_hidden=256 config) are resident in VMEM
across the whole grid. Matmuls run in bf16 on the MXU with f32 accumulation.

Supported decoder config: ReLU (beta=0), no SPADE, no LayerNorm,
combine_layer > n_blocks (the reference flagship + default settings).
Callers fall back to the XLA path otherwise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _mlp_tail(feat, code, w_in_ref, b_in_ref, wz_ref, bz_ref,
              w0_ref, b0_ref, w1_ref, b1_ref, w_last_ref, scal_ref,
              *, n_blocks: int):
    """Whole ResnetFC + tanh head on a (TILE, d) block, VMEM-resident.

    Weights arrive pre-cast to bf16 (extract_resnetfc_weights) so the MXU
    feeds need no per-tile converts; accumulation and the residual stream
    stay f32. lin_out and the TSDF head are pre-folded into one (H, 1)
    matmul (w_last = w_out[:, :d_geo] @ w_head, f32 product at extract
    time) — the semantic columns of lin_out never touch the kernel.
    The block loop + head are the shared `_blocks_and_head`."""
    alpha = scal_ref[0, 0]
    x = _bf16_dot(feat, w_in_ref[:]) + b_in_ref[:]
    return _blocks_and_head(
        x,
        lambda b: alpha * (_bf16_dot(code, wz_ref[b]) + bz_ref[b]),
        w0_ref, b0_ref, w1_ref, b1_ref, w_last_ref[:], scal_ref[0, 1],
        n_blocks=n_blocks, smoothing=scal_ref[0, 2],
    )


def _kernel(feat_ref, code_ref, w_in_ref, b_in_ref, wz_ref, bz_ref,
            w0_ref, b0_ref, w1_ref, b1_ref, w_last_ref, scal_ref,
            out_ref, *, n_blocks: int):
    out_ref[:] = _mlp_tail(
        feat_ref[:], code_ref[:], w_in_ref, b_in_ref, wz_ref, bz_ref,
        w0_ref, b0_ref, w1_ref, b1_ref, w_last_ref, scal_ref,
        n_blocks=n_blocks,
    )


def extract_resnetfc_weights(mlp_params: dict, head_params: dict, n_blocks: int,
                             d_geo: int, head_smoothing: float = 1.0):
    """Pack flax ResnetFC + TSDFHeadSimple params into padded kernel arrays.

    Returns a dict of stacked, lane-padded weight arrays. Matrix weights are
    pre-cast to bf16 (the kernel's MXU input dtype — identical numerics to
    casting inside the kernel, but no per-tile converts and half the VMEM);
    biases stay f32 (they add into the f32 accumulator). lin_out and the
    TSDF head fold into one (H, 1) column `w_last` with scalar bias
    `b_last` — the product is taken in f32 before the bf16 cast, so the
    fold is *more* accurate than chaining the two bf16 matmuls.
    """
    w_in = np.asarray(mlp_params["lin_in"]["kernel"])   # (d_in, H)
    b_in = np.asarray(mlp_params["lin_in"]["bias"])
    H = w_in.shape[1]
    wz = np.stack([np.asarray(mlp_params[f"lin_z_{i}"]["kernel"]) for i in range(n_blocks)])
    bz = np.stack([np.asarray(mlp_params[f"lin_z_{i}"]["bias"]) for i in range(n_blocks)])
    w0 = np.stack([np.asarray(mlp_params[f"block_{i}"]["Dense_0"]["kernel"]) for i in range(n_blocks)])
    b0 = np.stack([np.asarray(mlp_params[f"block_{i}"]["Dense_0"]["bias"]) for i in range(n_blocks)])
    w1 = np.stack([np.asarray(mlp_params[f"block_{i}"]["Dense_1"]["kernel"]) for i in range(n_blocks)])
    b1 = np.stack([np.asarray(mlp_params[f"block_{i}"]["Dense_1"]["bias"]) for i in range(n_blocks)])
    w_out = np.asarray(mlp_params["lin_out"]["kernel"])  # (H, d_out)
    b_out = np.asarray(mlp_params["lin_out"]["bias"])
    w_head = np.asarray(head_params["Dense_0"]["kernel"])  # (d_geo, 1)
    b_head = np.asarray(head_params["Dense_0"]["bias"])    # (1,)
    alpha = np.asarray(mlp_params["alpha"], np.float32).reshape(1, 1)

    d_in = w_in.shape[0]
    d_code = wz.shape[1]
    d_out = w_out.shape[1]
    d_in_p = _round_up(d_in, 128)
    d_code_p = _round_up(d_code, 128)
    d_out_p = _round_up(d_out, 128)

    bf16 = jnp.bfloat16

    def pad2(a, r, c):
        return np.pad(a, ((0, r - a.shape[0]), (0, c - a.shape[1]))).astype(bf16)

    def pad3(a, r, c):
        return np.pad(a, ((0, 0), (0, r - a.shape[1]), (0, c - a.shape[2]))).astype(bf16)

    # lin_out ∘ head fold: tsdf = tanh(relu(x) @ w_last + b_last) where
    # w_last = w_out[:, :d_geo] @ w_head (f32), b_last = b_out[:d_geo]@w_head.
    # Lane-padded to (H, 128); column 0 carries the value.
    w_last_col = (w_out[:, :d_geo].astype(np.float64) @ w_head.astype(np.float64))
    w_last = np.zeros((H, 128), np.float32)
    w_last[:, 0] = w_last_col[:, 0]
    b_last = float(b_out[:d_geo].astype(np.float64) @ w_head[:, 0].astype(np.float64))
    # SMEM scalars: [alpha, b_last, head_smoothing (post-tanh output scale)]
    scal = np.array([[float(alpha[0, 0]), b_last, float(head_smoothing)]],
                    np.float32)

    return {
        # unpadded f32 copies for the grid kernel's table pre-projection
        # (lin_in/lin_z distribute over the separable axis sums and move
        # out of the kernel entirely — see _grid_tables)
        "w_in_raw": w_in.astype(np.float32),
        "wz_raw": wz.astype(np.float32),
        "bz_raw": bz.astype(np.float32),
        # f32 block weights for the XLA tier off-TPU, where bf16 matmuls
        # would silently diverge from the f32 gather-path eval numerics
        # (on TPU bf16 is the platform's default matmul feed anyway)
        "w0_f32": w0.astype(np.float32),
        "w1_f32": w1.astype(np.float32),
        "w_last_f32": w_last.astype(np.float32),
        "w_in": pad2(w_in, d_in_p, H),
        "b_in": b_in.astype(np.float32).reshape(1, H),
        "wz": pad3(wz, d_code_p, H),
        "bz": bz.astype(np.float32).reshape(n_blocks, 1, H),
        "w0": w0.astype(bf16),
        "b0": b0.astype(np.float32).reshape(n_blocks, 1, H),
        "w1": w1.astype(bf16),
        "b1": b1.astype(np.float32).reshape(n_blocks, 1, H),
        "w_last": w_last.astype(bf16),
        "scal": scal,
        "b_head": float(b_head[0]),
        "dims": (d_in, d_code, d_out, H, d_in_p, d_code_p, d_out_p),
    }


_POINT_KERNEL_KEYS = (
    "w_in", "b_in", "wz", "bz", "w0", "b0", "w1", "b1", "w_last", "scal",
)


def fused_resnetfc_tsdf(
    feat: jnp.ndarray,
    code: jnp.ndarray,
    weights: dict,
    n_blocks: int,
    tile: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the fused decoder on arbitrary points.

    Args:
        feat: (N, d_in) encoder features (the MLP input x).
        code: (N, d_code) positional encoding (the injected latent z).
        weights: from `extract_resnetfc_weights`.

    Returns:
        (N,) TSDF values (tanh'd). Assumes head bias == 0 (its init; the
        caller checks).
    """
    # only the kernel-side arrays cross the jit boundary — the raw f32
    # copies (w_in_raw/wz_raw/bz_raw) exist for the grid-table builder and
    # would otherwise be device-transferred on every call
    kernel_weights = {k: weights[k] for k in _POINT_KERNEL_KEYS}
    return _fused_resnetfc_tsdf_jit(
        feat, code, kernel_weights, n_blocks=n_blocks, tile=tile,
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("n_blocks", "tile", "interpret"))
def _fused_resnetfc_tsdf_jit(
    feat: jnp.ndarray,
    code: jnp.ndarray,
    weights: dict,
    n_blocks: int,
    tile: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    N, d_in = feat.shape
    d_code = code.shape[1]
    H = weights["w_in"].shape[1]
    d_in_p = weights["w_in"].shape[0]
    d_code_p = weights["wz"].shape[1]

    pad_n = (-N) % tile
    # inputs stream to the kernel in bf16 (the MXU dtype): half the HBM
    # traffic of the f32 variant, no in-kernel converts
    feat_p = jnp.pad(feat, ((0, pad_n), (0, d_in_p - d_in))).astype(jnp.bfloat16)
    code_p = jnp.pad(code, ((0, pad_n), (0, d_code_p - d_code))).astype(jnp.bfloat16)
    n_tiles = feat_p.shape[0] // tile

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, d_in_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d_code_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in_p, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, d_code_p, H), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, 1, H), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, H, H), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, 1, H), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, H, H), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, 1, H), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
    )
    flops_per_pt = 2 * (d_in_p * H + n_blocks * (d_code_p * H + 2 * H * H) + H * 128)
    out = pl.pallas_call(
        functools.partial(_kernel, n_blocks=n_blocks),
        out_shape=jax.ShapeDtypeStruct((feat_p.shape[0],), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pt * feat_p.shape[0],
            bytes_accessed=feat_p.size * 2 + code_p.size * 2 + feat_p.shape[0] * 4,
            transcendentals=feat_p.shape[0],
        ),
        interpret=interpret,
    )(
        feat_p, code_p,
        weights["w_in"], weights["b_in"], weights["wz"], weights["bz"],
        weights["w0"], weights["b0"], weights["w1"], weights["b1"],
        weights["w_last"], weights["scal"],
    )
    return out[:N]


def supports_fused_decode(cfg) -> bool:
    """Whether the model config matches the kernel's supported decoder."""
    m = cfg.mlp
    return (
        m.beta == 0.0
        and not m.use_spade
        and not m.use_layer_norm
        and m.combine_layer >= m.n_blocks
        and cfg.use_code
    )


# ---------------------------------------------------------------------------
# Separable dense-GRID decode: zero gathers
# ---------------------------------------------------------------------------
#
# For the dense TSDF decode the query points form a REGULAR grid, so the
# triplane bilinear sample factors per axis: each 128x128 plane is resampled
# once onto its 2D grid slice by two small matmuls (MXU work, ~1 GFLOP
# total), and the per-point feature becomes a gather-free broadcast-add
#     feat(i,j,k) = P_xz[i,k] + P_xy[i,j] + P_yz[j,k].
# The NeRF positional encoding is likewise axis-separable into three tables
# with disjoint nonzero columns:
#     code(i,j,k) = T_x[i] + T_y[j] + T_z[k]   (exact).
# Because lin_in and the per-block lin_z are LINEAR, they distribute over
# those sums: every table is pre-projected to H=d_hidden outside the kernel
# (q = P @ w_in, z_b = alpha * T @ wz_b — a few GFLOP over the axis grids),
# so the kernel streams (Tj*nz)-point tiles, reconstructs x0 and the
# latent injections by broadcast-ADDS only, and spends its MXU time purely
# on the H×H residual-block matmuls + the folded head. Replaces the
# reference's 10k-point chunked dense decode (src/models/model.py:769-777).


def _resample_matrix(u: jnp.ndarray, reso: int) -> jnp.ndarray:
    """(n,) normalized coords in [0,1) -> (n, reso) bilinear weight rows.

    Matches grid_sample_2d(align_corners=True, border): t = u*(reso-1),
    floor/frac split, two taps clamped into range.
    """
    t = u * (reso - 1)
    lo = jnp.floor(t)
    w = (t - lo)[:, None]
    lo_i = jnp.clip(lo.astype(jnp.int32), 0, reso - 1)
    hi_i = jnp.clip(lo_i + 1, 0, reso - 1)
    eye = jnp.eye(reso, dtype=u.dtype)
    return eye[lo_i] * (1.0 - w) + eye[hi_i] * w


def _normalize_axis(c: jnp.ndarray, padding: float) -> jnp.ndarray:
    """ops.coords.normalize_coordinate, one axis."""
    u = c / (1.0 + padding + 10e-6) + 0.5
    return jnp.clip(u, 0.0, 1.0 - 10e-6)


def _resample_plane(plane: jnp.ndarray, wh: jnp.ndarray, ww: jnp.ndarray) -> jnp.ndarray:
    """Separable bilinear resample of a (C, H, W) plane -> (nw, nh, C)."""
    C, H, W = plane.shape
    hp = jax.lax.Precision.HIGHEST
    p = plane.transpose(1, 2, 0)  # (H, W, C)
    q = jnp.dot(wh, p.reshape(H, W * C), precision=hp).reshape(-1, W, C)  # (nh, W, C)
    q = q.transpose(1, 0, 2).reshape(W, -1)  # (W, nh*C)
    r = jnp.dot(ww, q, precision=hp)  # (nw, nh*C)
    return r.reshape(ww.shape[0], wh.shape[0], C)


def _pe_axis_table(c: jnp.ndarray, axis: int, num_freqs: int, freq_factor: float,
                   include_input: bool) -> jnp.ndarray:
    """(n,) axis coords -> (n, d_code) table whose nonzero columns are this
    axis's share of positional_encoding's interleaved layout."""
    n = c.shape[0]
    d_code = num_freqs * 2 * 3 + (3 if include_input else 0)
    t = jnp.zeros((n, d_code), c.dtype)
    off = 3 if include_input else 0
    if include_input:
        t = t.at[:, axis].set(c)
    for f in range(num_freqs):
        freq = freq_factor * 2.0**f
        t = t.at[:, off + (2 * f) * 3 + axis].set(jnp.sin(freq * c))
        t = t.at[:, off + (2 * f + 1) * 3 + axis].set(jnp.sin(freq * c + np.pi * 0.5))
    return t


def _bf16_dot(a, w):
    """The decoder's MXU feed: bf16 inputs, f32 accumulation."""
    return jax.lax.dot(a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)


def _f32_dot(a, w):
    """True-f32 dot for off-TPU eval parity (this JAX build's DEFAULT f32
    matmul precision is bf16-level — BENCH.md round-2 numerics finding)."""
    return jax.lax.dot(a, w, precision=jax.lax.Precision.HIGHEST)


def _blocks_and_head(x, tz_fn, w0, b0, w1, b1, w_last, b_last, *,
                     n_blocks: int, dot=_bf16_dot, smoothing=None):
    """Shared ResnetFC residual-block loop + folded tanh head on
    pre-projected inputs: x is the lin_in output (f32), tz_fn(b) returns
    block b's pre-projected latent injection. Single source of truth for
    BOTH the Pallas grid kernel and the tier-2 XLA slab decode — their
    numerics must never fork (tests compare the tiers against each other).
    f32 residual stream; only the `dot` feeds round (bf16 on the MXU, or
    true f32 off-TPU via `dot=_f32_dot` with f32 weights)."""
    for b in range(n_blocks):
        x = x + tz_fn(b).astype(jnp.float32)
        net = dot(jnp.maximum(x, 0.0), w0[b]) + b0[b]
        dx = dot(jnp.maximum(net, 0.0), w1[b]) + b1[b]
        x = x + dx
    out = dot(jnp.maximum(x, 0.0), w_last)
    y = jnp.tanh(out[:, 0] + b_last)
    # post-tanh head smoothing scale (scal[0, 2]); None = legacy callers
    # predating the scalar — identical to 1.0
    return y if smoothing is None else y * smoothing


def _grid_kernel(qyz_ref, qxz_ref, qxy_ref, zx_ref, zy_ref, zz_ref,
                 w0_ref, b0_ref, w1_ref, b1_ref, w_last_ref, scal_ref,
                 out_ref, *, n_blocks: int, tj: int, nz: int):
    """Projected-tables grid kernel: lin_in and every lin_z are ALREADY
    applied to the separable axis tables outside the kernel (they distribute
    over the axis sums feat = P_xz+P_xy+P_yz and code = T_x+T_y+T_z), so the
    in-kernel work is only the H×H residual-block matmuls + the folded head.
    Tables arrive f32 (see _grid_tables); the residual stream stays f32 and
    only the MXU feeds round to bf16."""
    f32 = jnp.float32
    H = qyz_ref.shape[-1]

    # x0 = feat @ w_in + b_in, as a broadcast-add of pre-projected tables
    # (b_in is folded into q_yz at table-build time)
    x = (
        qyz_ref[:].reshape(tj, nz, H)
        + qxz_ref[0][None, :, :]
        + qxy_ref[0][:, None, :]
    ).reshape(tj * nz, H).astype(f32)

    def tz_fn(b):
        # alpha * (code @ lin_z_b + bz_b), pre-projected per axis
        # (alpha and bz folded into the tables)
        return (
            zy_ref[b][:, None, :]
            + zz_ref[b][None, :, :]
            + zx_ref[0, b][None, None, :]
        ).reshape(tj * nz, H)

    out_ref[:] = _blocks_and_head(
        x, tz_fn, w0_ref, b0_ref, w1_ref, b1_ref, w_last_ref[:],
        scal_ref[0, 1], n_blocks=n_blocks, smoothing=scal_ref[0, 2],
    )


def pick_grid_tile(ny: int, nz: int, max_points: int = 3072):
    """Largest j-tile whose point count tiles Mosaic's 1D output layout
    (1024-element multiples — a 1D out tile is effectively (8, 128)) with
    sublane-aligned block shapes (block dims divisible by 8 unless equal to
    the array dim), or None (caller falls back to the XLA path).

    max_points=3072 is the largest tile PROVEN to compile on v5e (BENCH.md
    round-2 log: 3072 runs at ~76% MXU; 6144 (tj=64) fails TPU compile on
    VMEM; and round 4 found 4096 — tj=32 at the reference-default
    [416,416,128] grid, nz=128 — statically legal but Mosaic-REJECTED at
    compile time after ~500 s, crashing through to the XLA tier). Capping
    at the proven tile makes the reference-default grid pick tj=16/2048,
    which compiles and keeps the kernel tier at 3.5x the flagship points."""
    best = None
    for tj in range(1, min(ny, 64) + 1):
        if (
            ny % tj == 0
            and (tj * nz) % 1024 == 0
            and tj * nz <= max_points
            and (tj % 8 == 0 or tj == ny)
        ):
            best = tj
    return best


@functools.partial(jax.jit, static_argnames=(
    "voxel_dim", "voxel_size", "n_blocks", "num_freqs", "freq_factor",
    "include_input", "padding", "tj", "interpret", "coord_center",
    "coord_scale"))
def fused_grid_decode(
    plane_xz: jnp.ndarray,
    plane_xy: jnp.ndarray,
    plane_yz: jnp.ndarray,
    origin: jnp.ndarray,
    weights: dict,
    *,
    voxel_dim,
    voxel_size: float,
    n_blocks: int,
    num_freqs: int,
    freq_factor: float,
    include_input: bool,
    padding: float,
    tj: int,
    interpret: bool = False,
    coord_center=None,
    coord_scale=None,
) -> jnp.ndarray:
    """Dense TSDF volume via the separable grid kernel.

    Args:
        plane_*: (C, reso, reso) triplane features (batch squeezed).
        origin: (3,) world origin of the decode grid.
        weights: `extract_resnetfc_weights` output.

    Returns:
        (nx, ny, nz) float32 TSDF.
    """
    nx, ny, nz = (int(d) for d in voxel_dim)
    tables = _grid_tables(
        plane_xz, plane_xy, plane_yz, origin, weights,
        voxel_dim=(nx, ny, nz), voxel_size=voxel_size, num_freqs=num_freqs,
        freq_factor=freq_factor, include_input=include_input, padding=padding,
        coord_center=coord_center, coord_scale=coord_scale,
    )
    out = _grid_kernel_call(
        *tables, weights, n_blocks=n_blocks, tj=tj, interpret=interpret,
    )
    return out.reshape(nx, ny, nz)


def _grid_tables(plane_xz, plane_xy, plane_yz, origin, weights, *, voxel_dim,
                 voxel_size, num_freqs, freq_factor, include_input, padding,
                 coord_center=None, coord_scale=None):
    """Pre-projected axis tables for the grid kernel.

    lin_in and lin_z distribute over the separable sums
        feat(i,j,k) = P_xz[i,k] + P_xy[i,j] + P_yz[j,k]
        code(i,j,k) = T_x[i] + T_y[j] + T_z[k]
    so each table is projected through its matmul HERE (a few GFLOP over the
    axis grids — ~0.1% of the kernel's work) and the kernel's per-point
    lin_in/lin_z matmuls vanish into broadcast-adds. This also removes the
    lane padding waste of the (d_code=39 -> 128) lin_z matmuls.

    Returns (q_yz (ny*nz, H), q_xz (nx, nz, H), q_xy (nx, ny, H),
    z_x (nx, n_blocks, H), z_y (n_blocks, ny, H), z_z (n_blocks, nz, H)),
    all f32 (the tables carry the FULL pre-activation signal — bf16 here
    costs ~3x the end-to-end error because the rounding lands after the
    projection instead of before it; the traffic is trivial vs the H×H
    matmul compute), with b_in folded into q_yz and alpha/bz folded into
    the z tables.

    coord_center/coord_scale: optional affine map applied to the PLANE
    coordinates only (GenNerf.pointnet.normalize_coords); the PE tables
    always use raw world coordinates, matching GenNerf.decode."""
    nx, ny, nz = voxel_dim
    reso = plane_xz.shape[-1]
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    origin = origin.astype(f32)
    w_in = weights["w_in_raw"].astype(f32)   # (d_in, H)
    b_in = weights["b_in"][0].astype(f32)    # (H,)
    wz = weights["wz_raw"].astype(f32)       # (n_blocks, d_code, H)
    bz = weights["bz_raw"].astype(f32)       # (n_blocks, H)
    alpha = weights["scal"][0, 0].astype(f32)

    # world coordinates per axis (train/predict.dense_grid_points convention)
    axes = [
        jnp.linspace(0.0, voxel_size * n, n, dtype=f32) + origin[a]
        for a, n in enumerate((nx, ny, nz))
    ]
    if coord_center is not None:
        plane_axes = [
            (c - coord_center[a]) / coord_scale for a, c in enumerate(axes)
        ]
    else:
        plane_axes = axes
    ws = [_resample_matrix(_normalize_axis(c, padding), reso) for c in plane_axes]

    def proj(p):
        # (a, b, C) resampled plane -> (a, b, H) through lin_in, f32
        return jnp.einsum("abc,ch->abh", p, w_in, precision=hp)

    # plane orientation: sample_plane_feature width = first normalized coord,
    # height = second ('xz' -> (x, z): width x, height z, etc.). Everything
    # stays f32 end-to-end; the kernel's dot() casts to bf16 only at the MXU
    # feeds, exactly like the unprojected design did after its own matmul.
    q_xz = proj(_resample_plane(plane_xz.astype(f32), ws[2], ws[0]))
    q_xy = proj(_resample_plane(plane_xy.astype(f32), ws[1], ws[0]))
    q_yz = proj(_resample_plane(plane_yz.astype(f32), ws[2], ws[1])) + b_in
    q_yz = q_yz.reshape(ny * nz, -1)

    tabs = [
        _pe_axis_table(axes[a], a, num_freqs, freq_factor, include_input)
        for a in range(3)
    ]
    # z_a[b] = alpha * (T_a @ wz[b]); bz folds into the z axis's table
    z_x, z_y, z_z = (
        alpha * jnp.einsum("nd,bdh->bnh", t, wz, precision=hp) for t in tabs
    )
    z_z = z_z + alpha * bz[:, None, :]
    z_x = z_x.transpose(1, 0, 2)  # (nx, n_blocks, H)
    return q_yz, q_xz, q_xy, z_x, z_y, z_z


def fused_grid_decode_sharded(
    plane_xz: jnp.ndarray,
    plane_xy: jnp.ndarray,
    plane_yz: jnp.ndarray,
    origin: jnp.ndarray,
    weights: dict,
    mesh,
    *,
    voxel_dim,
    voxel_size: float,
    n_blocks: int,
    num_freqs: int,
    freq_factor: float,
    include_input: bool,
    padding: float,
    tj: int,
    axis_name: str = "data",
    interpret: bool = False,
    coord_center=None,
    coord_scale=None,
) -> jnp.ndarray:
    """Multi-chip dense decode: the x-axis of the grid shards over the mesh
    (Q_xz/Q_xy/Z_x split on axis 0, Q_yz/Z_y/Z_z + weights replicated), each
    device runs the grid kernel on its slab — embarrassingly parallel, zero
    collectives (the decode has no cross-point interaction, SURVEY §2.3)."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    nx, ny, nz = (int(d) for d in voxel_dim)
    n_dev = mesh.shape[axis_name]
    if nx % n_dev != 0:
        raise NotImplementedError(f"nx={nx} not divisible by {n_dev} devices")

    tables = _grid_tables(
        plane_xz, plane_xy, plane_yz, origin, weights,
        voxel_dim=(nx, ny, nz), voxel_size=voxel_size, num_freqs=num_freqs,
        freq_factor=freq_factor, include_input=include_input, padding=padding,
        coord_center=coord_center, coord_scale=coord_scale,
    )

    def local(p_yz, p_xz, p_xy, t_x, t_y, t_z, w):
        return _grid_kernel_call(
            p_yz, p_xz, p_xy, t_x, t_y, t_z, w,
            n_blocks=n_blocks, tj=tj, interpret=interpret,
        )

    # only the kernel-side weights replicate into the shard_map (the raw
    # f32 table-builder copies were consumed above in _grid_tables)
    kweights = {k: weights[k] for k in ("w0", "b0", "w1", "b1", "w_last", "scal")}
    sharded = P(axis_name)
    repl = P()
    out = shard_map(
        local,
        mesh=mesh,
        in_specs=(repl, sharded, sharded, sharded, repl, repl,
                  jax.tree.map(lambda _: repl, kweights)),
        out_specs=sharded,
        check_rep=False,
    )(*tables, kweights)
    return out.reshape(nx, ny, nz)


@functools.partial(jax.jit, static_argnames=(
    "voxel_dim", "voxel_size", "n_blocks", "num_freqs", "freq_factor",
    "include_input", "padding", "coord_center", "coord_scale", "use_bf16"))
def separable_grid_decode_xla(
    plane_xz: jnp.ndarray,
    plane_xy: jnp.ndarray,
    plane_yz: jnp.ndarray,
    origin: jnp.ndarray,
    weights: dict,
    *,
    voxel_dim,
    voxel_size: float,
    n_blocks: int,
    num_freqs: int,
    freq_factor: float,
    include_input: bool,
    padding: float,
    coord_center=None,
    coord_scale=None,
    use_bf16: "bool | None" = None,
) -> jnp.ndarray:
    """Pure-XLA separable grid decode: the SAME pre-projected tables as the
    Pallas kernel (zero gathers, lin_in/lin_z folded away), evaluated by a
    lax.map over x-slabs of (ny*nz, H) activations.

    This is the fallback tier between the Pallas kernel and the chunked
    gather decode: it carries no Mosaic tile constraints (any voxel_dim,
    any platform) while keeping the separability win — on v5e it measures
    ~3x the gather-based `decode_dense` (BENCH.md round-2 log).

    use_bf16: None auto-selects by platform — bf16 matmul feeds on TPU
    (the MXU's native dtype, matching the Pallas kernel), TRUE-f32 dots
    with f32 weights elsewhere so default CPU/GPU eval matches the f32
    gather-path numerics (the reference eval is f32 torch).
    """
    nx, ny, nz = (int(d) for d in voxel_dim)
    if use_bf16 is None:
        use_bf16 = jax.devices()[0].platform == "tpu"
    tables = _grid_tables(
        plane_xz, plane_xy, plane_yz, origin, weights,
        voxel_dim=(nx, ny, nz), voxel_size=voxel_size, num_freqs=num_freqs,
        freq_factor=freq_factor, include_input=include_input, padding=padding,
        coord_center=coord_center, coord_scale=coord_scale,
    )
    q_yz, q_xz, q_xy, z_x, z_y, z_z = tables
    H = q_yz.shape[-1]
    f32 = jnp.float32
    # per-block z_y[b] + z_z[b] outer sums are x-independent: precompute one
    # (n_blocks, ny*nz, H) tensor and slab-add only z_x inside the map
    tz_yz = (z_y[:, :, None, :] + z_z[:, None, :, :]).reshape(n_blocks, ny * nz, H)

    if use_bf16:
        w0, w1 = weights["w0"], weights["w1"]
        w_last, dot = weights["w_last"][:, :1], _bf16_dot
    else:
        w0, w1 = weights["w0_f32"], weights["w1_f32"]
        w_last, dot = weights["w_last_f32"][:, :1], _f32_dot

    def slab(args):
        qxz_i, qxy_i, zx_i = args  # (nz,H), (ny,H), (n_blocks,H)
        x = (
            q_yz.reshape(ny, nz, H)
            + qxz_i[None, :, :]
            + qxy_i[:, None, :]
        ).reshape(ny * nz, H).astype(f32)
        return _blocks_and_head(
            x, lambda b: tz_yz[b] + zx_i[b][None, :],
            w0, weights["b0"], w1, weights["b1"],
            w_last, weights["scal"][0, 1],
            n_blocks=n_blocks, dot=dot, smoothing=weights["scal"][0, 2],
        )

    vols = jax.lax.map(slab, (q_xz, q_xy, z_x))
    return vols.reshape(nx, ny, nz)


def _grid_kernel_call(q_yz, q_xz, q_xy, z_x, z_y, z_z, weights, *,
                      n_blocks: int, tj: int, interpret: bool) -> jnp.ndarray:
    """One pallas launch over an (nx, ny, nz) sub-grid. nx comes from the
    tables (x-sharded callers pass their local slice of Q_xz/Q_xy/Z_x and
    the full Q_yz/Z_y/Z_z)."""
    nx, nz, H = q_xz.shape
    ny = q_xy.shape[1]
    n_j = ny // tj
    tile = tj * nz

    grid_spec = pl.GridSpec(
        grid=(n_j, nx),
        in_specs=[
            pl.BlockSpec((tile, H), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nz, H), lambda j, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tj, H), lambda j, i: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_blocks, H), lambda j, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, tj, H), lambda j, i: (0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, nz, H), lambda j, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, H, H), lambda j, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, 1, H), lambda j, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, H, H), lambda j, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, 1, H), lambda j, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 128), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile,), lambda j, i: (i * n_j + j,), memory_space=pltpu.VMEM),
    )
    n_pts = nx * ny * nz
    flops_per_pt = 2 * (n_blocks * 2 * H * H + H * 128)
    return pl.pallas_call(
        functools.partial(_grid_kernel, n_blocks=n_blocks, tj=tj, nz=nz),
        out_shape=jax.ShapeDtypeStruct((n_pts,), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pt * n_pts,
            bytes_accessed=(q_yz.size + q_xz.size + q_xy.size) * 4 + n_pts * 4,
            transcendentals=n_pts,
        ),
        interpret=interpret,
    )(
        q_yz, q_xz, q_xy, z_x, z_y, z_z,
        weights["w0"], weights["b0"], weights["w1"], weights["b1"],
        weights["w_last"], weights["scal"],
    )
