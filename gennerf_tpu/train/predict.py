"""Dense TSDF decoding (inference) — the throughput-critical path.

Reference: GenNerf.predict_tsdf (model.py:752-790) splits the dense
nx·ny·nz query grid into 10k-point chunks and runs ~630 sequential forward
passes with a `.cpu()` per chunk. TPU-native version: the full grid is
decoded in large fixed-size chunks via `lax.map` inside ONE jit (no host
round trips), with the point axis shardable over the device mesh (pure data
parallel — no collectives).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gen_nerf import GenNerf, SceneRepr
from ..ops.coords import grid_coordinates


def dense_grid_points(voxel_dim, voxel_size: float, origin) -> jnp.ndarray:
    """Query grid matching the reference predict_tsdf convention
    (linspace over volume_size = voxel_size * voxel_dim)."""
    nx, ny, nz = voxel_dim
    volume_size = [voxel_size * d for d in voxel_dim]
    grid = grid_coordinates(nx, ny, nz, volume_size)
    return grid.reshape(-1, 3) + jnp.asarray(origin).reshape(1, 3)


@partial(jax.jit, static_argnames=("model", "chunk_size"))
def decode_dense(
    model: GenNerf,
    variables,
    repr_: SceneRepr,
    points: jnp.ndarray,
    origin: jnp.ndarray,
    chunk_size: int = 32768,
):
    """Decode TSDF at (N, 3) points in chunks on-device.

    N is padded to a chunk multiple; returns (N,) TSDF values.

    Defaults from the v5e sweep (BENCH.md): 32k-point chunks keep the
    per-chunk activations cache-resident (22.8M pts/s vs 14.5M at 256k),
    and the scene representation is sampled in the model's compute dtype
    (bf16 halves gather traffic; features feed a bf16 MLP anyway).
    """
    N = points.shape[0]
    pad = (-N) % chunk_size
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    chunks = pts.reshape(-1, chunk_size, 3)

    if model.dtype != jnp.float32:
        repr_ = SceneRepr(
            volume=None if repr_.volume is None else repr_.volume.astype(model.dtype),
            valid=repr_.valid,
            planes=None if repr_.planes is None else
            {k: v.astype(model.dtype) for k, v in repr_.planes.items()},
        )

    def decode_chunk(chunk):
        out = model.apply(variables, repr_, chunk[None], origin, method=GenNerf.decode)
        return out["tsdf"][0, :, 0]

    tsdf = jax.lax.map(decode_chunk, chunks)
    return tsdf.reshape(-1)[:N]


def _jax_runtime_error_types() -> tuple:
    """Exception classes a failed device compile/execution surfaces as
    (jax has moved these across versions; resolve what this build has)."""
    errs = []
    try:
        from jax.errors import JaxRuntimeError

        errs.append(JaxRuntimeError)
    except ImportError:
        pass
    try:
        from jaxlib.xla_extension import XlaRuntimeError

        errs.append(XlaRuntimeError)
    except ImportError:
        pass
    return tuple(errs) or (RuntimeError,)


_compile_notice_shapes = set()


def _log_first_compile_notice(voxel_dim) -> None:
    """One informational line per process per grid shape before the kernel
    tier: a cache-cold Mosaic compile takes minutes (BENCH.md: 445 s at
    [416,416,128]) and predict would otherwise look hung."""
    shape = tuple(int(v) for v in voxel_dim)
    if shape in _compile_notice_shapes:
        return
    _compile_notice_shapes.add(shape)
    import logging

    logging.getLogger("gennerf_tpu.predict").info(
        f"decoding grid {shape}: first use of a new grid shape compiles the "
        f"TPU kernel (can take minutes; cached afterwards under "
        f"{os.environ.get('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_comp_cache')})"
    )


def _warn_tier_fall(tier: str, voxel_dim, err: BaseException) -> None:
    """One-line note when a decode tier is skipped for a non-static reason
    (compile rejection / runtime failure): the fall-through is silent for
    the static NotImplementedError checks, but a Mosaic compile failure is
    worth surfacing — the user is paying the slower tier."""
    if isinstance(err, NotImplementedError):
        return
    import warnings

    warnings.warn(
        f"{tier} failed at voxel_dim {tuple(voxel_dim)} "
        f"({type(err).__name__}: {str(err).splitlines()[0][:200]}); "
        f"falling back to the next decode tier"
    )


def predict_tsdf_volume(
    model: GenNerf,
    variables,
    repr_: SceneRepr,
    voxel_dim: Tuple[int, int, int],
    voxel_size: float,
    origin,
    chunk_size: int = 32768,
    use_fused: bool = True,
    mesh=None,
) -> jnp.ndarray:
    """Dense TSDF volume (nx, ny, nz) at the grid convention of the
    reference's predict_tsdf.

    Tiers: (0) with a multi-device `mesh`, the x-slab-sharded Pallas grid
    kernel (zero collectives); (1) the single-device Pallas separable grid
    kernel (TPU, Mosaic-legal tile); (2) the pure-XLA separable decode
    with the same pre-projected tables (any platform/grid — ~3x the
    gather path); (3) the chunked gather decode (non-triplane
    representations)."""
    origin_a = jnp.asarray(origin, jnp.float32)

    # NotImplementedError = statically outside a tier's support (cheap
    # checks). Mosaic can ALSO reject a statically-legal tile at compile
    # time (observed: the reference-default [416,416,128] grid picks a
    # legal tj=32 tile whose remote compile fails) — that surfaces as a
    # jax runtime error at call time, and must fall through to the XLA
    # tier rather than crash the predict CLI mid-run.
    fallthrough = (NotImplementedError,) + _jax_runtime_error_types()
    if use_fused:
        # first decode of a NEW grid shape pays a fresh Mosaic kernel
        # compile (~minutes through the remote compiler on the tunneled
        # TPU; 445 s measured for [416,416,128], BENCH.md) — amortized by
        # the persistent compile cache (JAX_COMPILATION_CACHE_DIR) for
        # every later run at the same shape. Say so, or a one-shot predict
        # looks hung before its first voxel.
        _log_first_compile_notice(voxel_dim)
        if mesh is not None and int(np.prod(list(mesh.shape.values()))) > 1:
            try:
                return decode_grid_fused_sharded(
                    model, variables, repr_, voxel_dim, voxel_size, origin_a,
                    mesh,
                )
            except fallthrough as e:
                _warn_tier_fall("sharded grid kernel", voxel_dim, e)
        try:
            return decode_grid_fused(
                model, variables, repr_, voxel_dim, voxel_size, origin_a
            )
        except fallthrough as e:
            _warn_tier_fall("grid kernel", voxel_dim, e)
        try:
            return decode_grid_separable_xla(
                model, variables, repr_, voxel_dim, voxel_size, origin_a
            )
        except NotImplementedError:
            pass
    pts = dense_grid_points(voxel_dim, voxel_size, origin)
    tsdf = decode_dense(model, variables, repr_, pts, origin_a, chunk_size)
    # contract: every tier returns f32 (the grid kernel already does; a
    # bf16 model's gather tier would otherwise leak bf16 into npz exports)
    return tsdf.reshape(voxel_dim).astype(jnp.float32)


def predict_tsdf_volume_sparse(
    model: GenNerf,
    variables,
    repr_: SceneRepr,
    voxel_dim: Tuple[int, int, int],
    voxel_size: float,
    origin,
    projections,
    depths,
    trunc_ratio: float = 3.0,
    chunk_size: int = 32768,
) -> jnp.ndarray:
    """Prior-first sparse inference: decode ONLY the near-surface band.

    The fusion prior (tsdf.fusion.apply_fusion_prior) proves the fused
    value of the input frames is a deterministic constant outside the
    near-surface band (+1 where no frame writes, -1 in ray-traversed free
    space) — on typical scenes that is ~90% of the grid. The dense path
    decodes every voxel and then throws that work away at the clamp; this
    path inverts the order: compute the prior classes first (one jitted
    scan over frames), decode only the band voxels through the
    arbitrary-point tier, and fill the rest with the constants.

    Output contract: identical to
    `apply_fusion_prior(predict_tsdf_volume(use_fused=False), ...)` — the
    band voxels sit at exactly the dense grid's linspace positions and ride
    the same chunked gather decode (the fused grid kernel's separable math
    differs at bf16-rounding level, as documented in BENCH.md).

    Args:
        projections: (T, 3, 4) world->image of the ENCODED input frames.
        depths: (T, H, W).
    """
    from ..tsdf.fusion import _prior_classes

    nx, ny, nz = (int(d) for d in voxel_dim)
    origin_a = jnp.asarray(origin, jnp.float32).reshape(3)
    near, farfront = _prior_classes(
        (nx, ny, nz), float(voxel_size), origin_a,
        float(voxel_size) * trunc_ratio,
        jnp.asarray(projections), jnp.asarray(depths),
    )
    near_np = np.asarray(near)
    out = np.where(np.asarray(farfront), np.float32(-1.0), np.float32(1.0))
    idx = np.nonzero(near_np)[0]
    if idx.size:
        # flat index -> the dense grid's linspace coordinates (ops.coords.
        # grid_coordinates: x_i = i * voxel_size*n/(n-1), endpoints incl.)
        i = idx // (ny * nz)
        j = (idx // nz) % ny
        k = idx % nz
        step = np.array(
            [voxel_size * n / max(n - 1, 1) for n in (nx, ny, nz)], np.float32
        )
        pts = np.stack([i, j, k], axis=-1).astype(np.float32) * step
        pts += np.asarray(origin_a).reshape(1, 3)
        # quantize the host-side pad to chunk multiples so jit signatures
        # repeat across scenes with similar band sizes
        pad = (-idx.size) % chunk_size
        if pad:
            pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
        vals = decode_dense(
            model, variables, repr_, jnp.asarray(pts), origin_a, chunk_size
        )
        out[idx] = np.asarray(vals, np.float32)[: idx.size]
    return jnp.asarray(out.reshape(nx, ny, nz))


def _separable_grid_setup(model: GenNerf, variables, repr_: SceneRepr):
    """Shared eligibility checks + weight extraction for the separable grid
    decoders. Raises NotImplementedError when the config/representation is
    outside the separable-table formulation's support."""
    from ..ops.pallas.fused_decoder import (
        extract_resnetfc_weights,
        supports_fused_decode,
    )

    cfg = model.cfg
    if not supports_fused_decode(cfg):
        raise NotImplementedError("unsupported decoder config")
    planes = repr_.planes
    if (
        repr_.volume is not None
        or planes is None
        or set(planes) != {"xz", "xy", "yz"}
        or cfg.encoder.pointnet.sample_mode != "bilinear"
    ):
        raise NotImplementedError("grid decode supports triplane-only scenes")
    if planes["xz"].shape[0] != 1:
        raise NotImplementedError("grid decode handles one scene at a time")

    weights = extract_resnetfc_weights(
        variables["params"]["mlp"],
        variables["params"]["head_geo"],
        cfg.mlp.n_blocks,
        cfg.mlp.d_out_geo,
        head_smoothing=getattr(cfg.mlp, "head_smoothing", 1.0),
    )
    if abs(weights["b_head"]) > 0:
        raise NotImplementedError("fused decode assumes zero head bias")
    if weights["dims"][0] != planes["xz"].shape[1]:
        raise NotImplementedError("decoder latent != triplane channels")

    coord_center = coord_scale = None
    if cfg.encoder.pointnet.normalize_coords:
        extent = [d * cfg.voxel_size for d in cfg.voxel_dim_train]
        coord_center = tuple(e / 2.0 for e in extent)
        coord_scale = float(max(extent))
    common = dict(
        n_blocks=cfg.mlp.n_blocks,
        num_freqs=cfg.code.num_freqs,
        freq_factor=float(cfg.code.freq_factor),
        include_input=bool(cfg.code.include_input),
        padding=float(cfg.encoder.pointnet.padding),
        coord_center=coord_center,
        coord_scale=coord_scale,
    )
    return planes, weights, common


def decode_grid_fused(
    model: GenNerf,
    variables,
    repr_: SceneRepr,
    voxel_dim: Tuple[int, int, int],
    voxel_size: float,
    origin: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Dense decode through the separable Pallas grid kernel
    (ops/pallas/fused_decoder.fused_grid_decode): triplane sampling factors
    into per-axis resample matmuls, lin_in/lin_z pre-project the tables,
    and the kernel is pure residual-block matmuls — zero gathers.

    Raises NotImplementedError when the config/representation is outside the
    kernel's support; callers fall back to `decode_grid_separable_xla` /
    `decode_dense`.
    """
    from ..ops.pallas.fused_decoder import fused_grid_decode, pick_grid_tile

    if not interpret and jax.devices()[0].platform != "tpu":
        raise NotImplementedError("fused decode is TPU-only")
    # cheap check first: a tile-less grid falls through to tier 2 without
    # paying the weight extraction twice
    tj = pick_grid_tile(int(voxel_dim[1]), int(voxel_dim[2]))
    if tj is None:
        raise NotImplementedError(f"no lane-aligned tile for voxel_dim {voxel_dim}")
    planes, weights, common = _separable_grid_setup(model, variables, repr_)
    return fused_grid_decode(
        planes["xz"][0], planes["xy"][0], planes["yz"][0],
        origin, weights,
        voxel_dim=tuple(int(d) for d in voxel_dim),
        voxel_size=float(voxel_size),
        tj=tj,
        interpret=interpret,
        **common,
    )


def decode_grid_fused_sharded(
    model: GenNerf,
    variables,
    repr_: SceneRepr,
    voxel_dim: Tuple[int, int, int],
    voxel_size: float,
    origin: jnp.ndarray,
    mesh,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-chip dense decode: the grid's x axis shards over the mesh and
    each device runs the grid kernel on its slab — zero collectives
    (ops/pallas/fused_decoder.fused_grid_decode_sharded).

    Raises NotImplementedError when outside the kernel's support (callers
    fall back to the single-device tiers)."""
    from ..ops.pallas.fused_decoder import (
        fused_grid_decode_sharded,
        pick_grid_tile,
    )

    if not interpret and jax.devices()[0].platform != "tpu":
        raise NotImplementedError("fused decode is TPU-only")
    if len(mesh.axis_names) != 1:
        raise NotImplementedError(
            "sharded grid decode shards one mesh axis; flatten hybrid "
            "meshes for inference"
        )
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    if int(voxel_dim[0]) % n_dev:
        raise NotImplementedError(
            f"nx={voxel_dim[0]} not divisible by {n_dev} devices"
        )
    tj = pick_grid_tile(int(voxel_dim[1]), int(voxel_dim[2]))
    if tj is None:
        raise NotImplementedError(f"no lane-aligned tile for voxel_dim {voxel_dim}")
    planes, weights, common = _separable_grid_setup(model, variables, repr_)
    return fused_grid_decode_sharded(
        planes["xz"][0], planes["xy"][0], planes["yz"][0],
        origin, weights, mesh,
        voxel_dim=tuple(int(d) for d in voxel_dim),
        voxel_size=float(voxel_size),
        tj=tj,
        axis_name=axis,
        interpret=interpret,
        **common,
    )


def decode_grid_separable_xla(
    model: GenNerf,
    variables,
    repr_: SceneRepr,
    voxel_dim: Tuple[int, int, int],
    voxel_size: float,
    origin: jnp.ndarray,
) -> jnp.ndarray:
    """Dense decode with the separable pre-projected tables evaluated in
    pure XLA (lax.map over x-slabs) — any platform, any grid shape; ~3x the
    gather-based `decode_dense` on the same hardware (BENCH.md)."""
    from ..ops.pallas.fused_decoder import separable_grid_decode_xla

    planes, weights, common = _separable_grid_setup(model, variables, repr_)
    return separable_grid_decode_xla(
        planes["xz"][0], planes["xy"][0], planes["yz"][0],
        origin, weights,
        voxel_dim=tuple(int(d) for d in voxel_dim),
        voxel_size=float(voxel_size),
        **common,
    )


def _triplane_gather_setup(model: GenNerf, planes: dict):
    """Build-time state for the fast channels-last triplane gather: the 3
    planes flattened row-major into ONE (B, 3*r*r, C) bf16 table plus the
    static coordinate-mapping constants. The per-call path then costs one
    take_along_axis of all 12 texels and a weighted sum — zero transposes
    (the generic grid_sample_2d relayouts (B,N,C)->(B,C,N)->(B,N,C) per
    corner, which dominates the arbitrary-point feature stage)."""
    cfg = model.cfg
    p = cfg.encoder.pointnet
    reso = planes["xz"].shape[-1]
    B, C = planes["xz"].shape[0], planes["xz"].shape[1]
    # row index = x1 * r + x0 (sample_plane_feature layout contract)
    flat = jnp.concatenate([
        planes[k].transpose(0, 2, 3, 1).reshape(B, reso * reso, C)
        for k in ("xz", "xy", "yz")
    ], axis=1).astype(jnp.bfloat16)  # (B, 3*r*r, C)
    center = scale = None
    if p.normalize_coords:
        extent = jnp.asarray(cfg.voxel_dim_train, jnp.float32) * cfg.voxel_size
        center, scale = extent / 2.0, jnp.max(extent)
    return flat, reso, float(p.padding), center, scale


_PLANE_AXES = {"xz": (0, 2), "xy": (0, 1), "yz": (1, 2)}


def _triplane_feat_fast(flat, reso: int, padding: float, center, scale,
                        pts: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 3) world points -> (B, N, C) summed triplane features via one
    batched gather. Numerics match sample_plane_feature (align_corners=True,
    border clamp) with bf16 texels."""
    B, N, _ = pts.shape
    xyz = pts if center is None else (pts - center) / scale
    idxs, wts = [], []
    for pi, plane in enumerate(("xz", "xy", "yz")):
        a0, a1 = _PLANE_AXES[plane]
        # normalize_coordinate (ops/coords.py): p/(1+padding+1e-5) + 0.5,
        # clipped to [0, 1-1e-5] — constants matched exactly
        uv = xyz[..., (a0, a1)] / (1.0 + padding + 10e-6) + 0.5
        uv = jnp.clip(uv, 0.0, 1.0 - 10e-6)
        ix = uv[..., 0] * (reso - 1)  # align_corners unnormalize of 2uv-1
        iy = uv[..., 1] * (reso - 1)
        x0 = jnp.floor(ix)
        y0 = jnp.floor(iy)
        wx = (ix - x0)[..., None]
        wy = (iy - y0)[..., None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        x1i = jnp.clip(x0i + 1, 0, reso - 1)
        y1i = jnp.clip(y0i + 1, 0, reso - 1)
        x0i = jnp.clip(x0i, 0, reso - 1)
        y0i = jnp.clip(y0i, 0, reso - 1)
        base = pi * reso * reso
        idxs.append(jnp.stack([
            base + y0i * reso + x0i, base + y0i * reso + x1i,
            base + y1i * reso + x0i, base + y1i * reso + x1i,
        ], axis=1))  # (B, 4, N)
        w = jnp.concatenate([
            (1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy,
        ], axis=-1)  # (B, N, 4)
        wts.append(w.transpose(0, 2, 1))  # (B, 4, N)
    idx = jnp.concatenate(idxs, axis=1).reshape(B, 12 * N, 1)
    w = jnp.concatenate(wts, axis=1)  # (B, 12, N)
    vals = jnp.take_along_axis(flat, idx, axis=1)  # (B, 12N, C) bf16
    vals = vals.reshape(B, 12, N, -1)
    return (vals * w[..., None]).sum(axis=1)  # f32 via weight promote


def make_point_tsdf_fn(
    model: GenNerf,
    variables,
    repr_: SceneRepr,
    origin,
    tile: int = 2048,
    interpret: bool = False,
):
    """Fast FORWARD-ONLY TSDF evaluation at arbitrary points: bf16 triplane
    gathers + positional encoding in XLA feeding the fused Pallas
    ResnetFC/TSDF kernel (one launch per call, no lax.map around it).

    This is the arbitrary-point analog of the separable grid tiers
    (VERDICT round-2 missing #4): ray-marched renderer samples and other
    non-grid query sets have no separable structure to exploit, but the
    MLP — the FLOP majority — still runs as pure H x H residual matmuls in
    the kernel. Workloads: reference renderer.py:172 marched decodes,
    model.py:769-style arbitrary chunks.

    Returns tsdf_fn(pts (B, N, 3)) -> (B, N) float32. No gradient support
    (the kernel has no VJP) — training paths keep the XLA decode. Raises
    NotImplementedError when the config/representation is unsupported
    (callers fall back to the plain decode path).
    """
    from ..models.positional_encoding import positional_encoding
    from ..ops.pallas.fused_decoder import (
        extract_resnetfc_weights,
        fused_resnetfc_tsdf,
        supports_fused_decode,
    )

    cfg = model.cfg
    if not interpret and jax.devices()[0].platform != "tpu":
        raise NotImplementedError("fused point decode is TPU-only")
    if not supports_fused_decode(cfg):
        raise NotImplementedError("unsupported decoder config")
    planes = repr_.planes
    if repr_.volume is not None or planes is None or set(planes) != {"xz", "xy", "yz"}:
        raise NotImplementedError("fused point decode supports triplane-only scenes")
    weights = extract_resnetfc_weights(
        variables["params"]["mlp"], variables["params"]["head_geo"],
        cfg.mlp.n_blocks, cfg.mlp.d_out_geo,
        head_smoothing=getattr(cfg.mlp, "head_smoothing", 1.0),
    )
    if abs(weights["b_head"]) > 0:
        raise NotImplementedError("fused decode assumes zero head bias")
    if weights["dims"][0] != planes["xz"].shape[1]:
        raise NotImplementedError("decoder latent != triplane channels")
    # bf16 planes flattened into one channels-last table: the 12 bilinear
    # texels of all 3 planes gather in ONE take_along_axis with zero
    # transposes (the generic grid_sample path's per-corner relayouts
    # dominate the arbitrary-point feature stage)
    flat, reso, padding, center, scale = _triplane_gather_setup(model, planes)
    n_blocks = cfg.mlp.n_blocks
    code_cfg = cfg.code

    def tsdf_fn(pts: jnp.ndarray) -> jnp.ndarray:
        B, N, _ = pts.shape
        feat = _triplane_feat_fast(flat, reso, padding, center, scale, pts)
        code = positional_encoding(
            pts.reshape(-1, 3), code_cfg.num_freqs, code_cfg.freq_factor,
            code_cfg.include_input,
        )
        vals = fused_resnetfc_tsdf(
            feat.reshape(B * N, -1), code, weights, n_blocks,
            tile=tile, interpret=interpret,
        )
        return vals.reshape(B, N)

    return tsdf_fn


def decode_dense_fused(
    model: GenNerf,
    variables,
    repr_: SceneRepr,
    points: jnp.ndarray,
    origin: jnp.ndarray,
) -> jnp.ndarray:
    """Fast dense decode: XLA feature gathers + positional encoding feeding
    the fused Pallas ResnetFC/TSDF kernel (ops/pallas/fused_decoder.py).

    Raises NotImplementedError when the model config is outside the kernel's
    support; callers fall back to `decode_dense`.
    """
    import jax

    from ..ops.pallas.fused_decoder import (
        extract_resnetfc_weights,
        fused_resnetfc_tsdf,
        supports_fused_decode,
    )

    cfg = model.cfg
    if not supports_fused_decode(cfg) or jax.devices()[0].platform != "tpu":
        raise NotImplementedError("fused decode unsupported for this config/platform")

    weights = extract_resnetfc_weights(
        jax.tree.map(lambda x: x, variables["params"]["mlp"]),
        variables["params"]["head_geo"],
        cfg.mlp.n_blocks,
        cfg.mlp.d_out_geo,
        head_smoothing=getattr(cfg.mlp, "head_smoothing", 1.0),
    )
    if abs(weights["b_head"]) > 0:
        raise NotImplementedError("fused decode assumes zero head bias")

    from ..models.positional_encoding import positional_encoding

    # two dispatches: (1) chunked XLA feature gathers + positional encoding
    # over all points (chunking bounds the gather intermediates), (2) ONE
    # full-size Pallas kernel launch over the whole point set. Embedding the
    # pallas_call inside lax.map serializes catastrophically; a single big
    # grid is ~100x faster.
    chunk = 1 << 20

    @jax.jit
    def features_and_code(repr_, pts):
        N = pts.shape[0]
        pad = (-N) % chunk
        pts_p = jnp.pad(pts, ((0, pad), (0, 0))).reshape(-1, chunk, 3)

        def chunk_fn(p):
            feat = model.apply(
                variables, repr_, p[None], origin, method=GenNerf.map_features
            )[0]
            code = positional_encoding(
                p, cfg.code.num_freqs, cfg.code.freq_factor, cfg.code.include_input
            )
            return feat, code

        feat, code = jax.lax.map(chunk_fn, pts_p)
        d_feat = feat.shape[-1]
        d_code = code.shape[-1]
        return feat.reshape(-1, d_feat)[:N], code.reshape(-1, d_code)[:N]

    feat, code = features_and_code(repr_, points)
    return fused_resnetfc_tsdf(feat, code, weights, cfg.mlp.n_blocks, tile=2048)
