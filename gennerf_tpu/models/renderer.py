"""Surface renderer for neural TSDF fields (UNISURF/IDR-style).

Reference: src/models/renderer.py — a prototype intended for rendering the
semantic feature field for VLM-teacher distillation (never wired in and
referencing undefined helpers). This is a working TPU-native version:
fixed-step ray marching to bracket the first sign change of the TSDF,
secant refinement of the crossing, then feature lookup at the surface
point. Everything is fixed-shape (masked instead of gathered) and jit/vmap
safe, so it can sit inside a training step for rendering-based distillation.
"""
from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SurfaceRender(NamedTuple):
    depth: jnp.ndarray     # (B, R) surface depth along the ray (0 if none)
    points: jnp.ndarray    # (B, R, 3) surface points (ray origin if none)
    mask: jnp.ndarray      # (B, R) bool — ray hit a zero crossing
    features: jnp.ndarray  # (B, R, C) decoded features at the surface


def pixels_to_rays(h_idxs, w_idxs, intrinsics, pose):
    """Pixel coords -> world-space ray origins + unit directions.

    Args:
        h_idxs, w_idxs: (B, R).
        intrinsics: (B, 3, 3); pose: (B, 4, 4) camera2world.
    """
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    dirs_cam = jnp.stack(
        [(w_idxs - cx) / fx, (h_idxs - cy) / fy, jnp.ones_like(w_idxs + 0.0)], axis=-1
    )  # (B, R, 3)
    R = pose[:, :3, :3]
    dirs = jnp.einsum("bij,brj->bri", R, dirs_cam)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(pose[:, None, :3, 3], dirs.shape)
    return origins, dirs


def _first_crossing(vals, ts):
    """First +->- crossing over per-ray sample rows.

    vals (B, R, S); ts (S,) shared or (B, R, S) per-ray. Returns
    (t_lo, t_hi, f_lo, f_hi, any_cross)."""
    sign_change = (vals[..., :-1] > 0) & (vals[..., 1:] <= 0)  # (B, R, S-1)
    any_cross = sign_change.any(axis=-1)
    first = jnp.argmax(sign_change, axis=-1)  # index of first crossing
    if ts.ndim == 1:
        t_lo, t_hi = ts[first], ts[first + 1]
    else:
        t_lo = jnp.take_along_axis(ts, first[..., None], axis=-1)[..., 0]
        t_hi = jnp.take_along_axis(ts, first[..., None] + 1, axis=-1)[..., 0]
    f_lo = jnp.take_along_axis(vals, first[..., None], axis=-1)[..., 0]
    f_hi = jnp.take_along_axis(vals, first[..., None] + 1, axis=-1)[..., 0]
    return t_lo, t_hi, f_lo, f_hi, any_cross


def ray_aabb_clip(origins, dirs, box_min, box_max, near, far):
    """Clip per-ray [near, far] to the axis-aligned box (slab method).

    Marching a fixed sample budget over a global [near, far] wastes most
    samples outside the scene volume (the decoded field is border-clamped
    there and cannot cross zero); clipping concentrates the same budget
    inside the box — finer brackets at equal cost. Rays that miss the box
    get an empty interval (t_near == t_far == far, so the march finds no
    crossing on them by construction).

    Args:
        origins, dirs: (B, R, 3); box_min/box_max: (3,) world corners.

    Returns:
        (t_near, t_far): (B, R) per-ray interval within [near, far].
    """
    inv = 1.0 / jnp.where(jnp.abs(dirs) > 1e-12, dirs, 1e-12)
    t0 = (box_min - origins) * inv  # (B, R, 3)
    t1 = (box_max - origins) * inv
    t_enter = jnp.minimum(t0, t1).max(axis=-1)
    t_exit = jnp.maximum(t0, t1).min(axis=-1)
    t_near = jnp.clip(t_enter, near, far)
    t_far = jnp.clip(t_exit, near, far)
    hit = t_exit > jnp.maximum(t_enter, near)
    t_near = jnp.where(hit, t_near, far)
    t_far = jnp.where(hit, t_far, far)
    return t_near, t_far


def ray_march_tsdf(
    tsdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    near: float = 0.05,
    far: float = 4.0,
    n_steps: int = 64,
    n_secant_steps: int = 8,
    n_fine_steps: int = 0,
    convention: str = "fusion",
    aabb: Tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Find the first outside->inside zero crossing along each ray.

    The reference marches occupancy (UNISURF: low outside, high inside,
    renderer.py:215-323). This framework's OWN fields share that shape:
    fused GT volumes store `clip((pz - depth)/trunc, min=-1)`
    (tsdf/fusion.py:76, reference tsdf.py:404) — NEGATIVE in observed free
    space, positive behind the surface — and trained decoders regress
    exactly those targets. The default `convention="fusion"` therefore
    finds the first - -> + crossing; pass `convention="sdf"` for classic
    signed-distance fields (+ outside, - inside), e.g. analytic oracles.

    With `n_fine_steps > 0` the march is hierarchical: a coarse pass over
    `n_steps` samples brackets the crossing, then `n_fine_steps` samples
    refine INSIDE the bracket before the secant iterations. At equal
    accuracy this cuts field evaluations ~2x (e.g. 24+8 hierarchical
    brackets at (far-near)/(23*7) vs 64 uniform at (far-near)/63) — the
    decode is the renderer's cost (SURVEY hot loop #1).

    Args:
        tsdf_fn: (B, N, 3) -> (B, N) field values.
        origins, dirs: (B, R, 3).

    Returns:
        depth (B, R) — crossing depth (0 where none found),
        mask (B, R) bool.
    """
    if convention not in ("fusion", "sdf"):
        raise ValueError(f"convention must be 'fusion' or 'sdf', got {convention!r}")
    if convention == "fusion":
        # negate once: the marched field is then + outside / - inside and
        # the +->- crossing logic below applies to both conventions
        raw_fn = tsdf_fn
        tsdf_fn = lambda p: -raw_fn(p)  # noqa: E731
    B, R, _ = origins.shape
    if aabb is not None:
        # per-ray interval clipped to the scene box: the whole fixed sample
        # budget lands where the field can actually cross zero (see
        # ray_aabb_clip); rays missing the box get empty intervals
        t_near, t_far = ray_aabb_clip(origins, dirs, aabb[0], aabb[1], near, far)
        u = jnp.linspace(0.0, 1.0, n_steps)
        ts = t_near[..., None] + (t_far - t_near)[..., None] * u  # (B, R, S)
        pts = origins[:, :, None, :] + dirs[:, :, None, :] * ts[..., None]
    else:
        ts = jnp.linspace(near, far, n_steps)  # (S,)
        pts = origins[:, :, None, :] + dirs[:, :, None, :] * ts[None, None, :, None]
    vals = tsdf_fn(pts.reshape(B, R * n_steps, 3)).reshape(B, R, n_steps)
    t_lo, t_hi, f_lo, f_hi, any_cross = _first_crossing(vals, ts)

    if n_fine_steps > 0:
        S = n_fine_steps
        u = jnp.linspace(0.0, 1.0, S)  # includes the bracket endpoints
        ts_f = t_lo[..., None] + (t_hi - t_lo)[..., None] * u  # (B, R, S)
        pts_f = origins[:, :, None, :] + dirs[:, :, None, :] * ts_f[..., None]
        vals_f = tsdf_fn(pts_f.reshape(B, R * S, 3)).reshape(B, R, S)
        ft_lo, ft_hi, ff_lo, ff_hi, fine_cross = _first_crossing(vals_f, ts_f)
        # a continuous field must re-cross inside the bracket; guard anyway
        t_lo = jnp.where(fine_cross, ft_lo, t_lo)
        t_hi = jnp.where(fine_cross, ft_hi, t_hi)
        f_lo = jnp.where(fine_cross, ff_lo, f_lo)
        f_hi = jnp.where(fine_cross, ff_hi, f_hi)

    # secant iterations (reference renderer.py:325; fixed-count fori_loop)
    def body(_, carry):
        t_lo, f_lo, t_hi, f_hi = carry
        denom = f_hi - f_lo
        t_mid = jnp.where(jnp.abs(denom) > 1e-12, t_lo - f_lo * (t_hi - t_lo) / denom,
                          0.5 * (t_lo + t_hi))
        t_mid = jnp.clip(t_mid, t_lo, t_hi)
        p_mid = origins + dirs * t_mid[..., None]
        f_mid = tsdf_fn(p_mid)
        f_mid = f_mid.reshape(B, R)
        go_low = f_mid > 0
        t_lo = jnp.where(go_low, t_mid, t_lo)
        f_lo = jnp.where(go_low, f_mid, f_lo)
        t_hi = jnp.where(go_low, t_hi, t_mid)
        f_hi = jnp.where(go_low, f_hi, f_mid)
        return t_lo, f_lo, t_hi, f_hi

    t_lo, f_lo, t_hi, f_hi = jax.lax.fori_loop(0, n_secant_steps, body, (t_lo, f_lo, t_hi, f_hi))
    denom = f_hi - f_lo
    depth = jnp.where(jnp.abs(denom) > 1e-12, t_lo - f_lo * (t_hi - t_lo) / denom,
                      0.5 * (t_lo + t_hi))
    depth = jnp.where(any_cross, depth, 0.0)
    return depth, any_cross


class SurfaceRenderer:
    """Functional UNISURF-style renderer over a decode function.

    decode_fn(xyz (B, N, 3)) -> dict with 'tsdf' (B, N, 1) and
    'feat_sem' (B, N, C) (the GenNerf decode contract).
    """

    def __init__(self, decode_fn, near: float = 0.05, far: float = 4.0,
                 n_steps: int = 16, n_secant_steps: int = 4,
                 n_max_network_queries: int = 786432, tsdf_fn=None,
                 n_fine_steps: int = 8, eval_chunk: int = 32768,
                 convention: str = "fusion", aabb=None):
        """Defaults are the round-3 TPU-tuned fast recipe (BENCH.md): a
        16-sample coarse march + 8-sample fine bracket refinement + 4
        secant iterations (the fine pass already brackets the crossing to
        (far-near)/105, so 4 superlinear secant steps land sub-voxel;
        pass 8 for the reference's count, renderer.py:325), with field
        lookups internally chunked to `eval_chunk` points (an unchunked
        MLP over the marched megabatch thrashes HBM with full-size
        activations — measured 24.4M vs 13.8M pts/s). Equal accuracy to
        the old 64-step uniform march at 2.9x the rays/s (0.596M vs
        0.203M on v5e-1). Set n_fine_steps=0 for the uniform march.

        `tsdf_fn` optionally overrides the march/secant field lookups
        with a custom forward-only evaluator ((B, N, 3) -> (B, N)). The
        final per-ray feature lookup always uses `decode_fn`.

        `convention`: 'fusion' (default — trained decoders regress fused
        GT, which is negative in free space; see ray_march_tsdf) or 'sdf'
        for classic + outside fields.

        `aabb`: optional (box_min, box_max) world corners of the scene
        volume; when set, each ray's march interval is clipped to the box
        (ray_aabb_clip) so the whole sample budget lands where the decoded
        field is live — at typical scene/frustum ratios this tightens the
        coarse bracket several-fold at identical cost."""
        self.decode_fn = decode_fn
        self.near = near
        self.far = far
        self.n_steps = n_steps
        self.n_secant_steps = n_secant_steps
        self.n_max_network_queries = n_max_network_queries
        self._tsdf_fast = tsdf_fn
        self.n_fine_steps = n_fine_steps
        self.eval_chunk = eval_chunk
        self.convention = convention
        self.aabb = (
            (jnp.asarray(aabb[0], jnp.float32), jnp.asarray(aabb[1], jnp.float32))
            if aabb is not None else None
        )

    def _tsdf(self, pts: jnp.ndarray) -> jnp.ndarray:
        if self._tsdf_fast is not None:
            return self._tsdf_fast(pts)
        B, N, _ = pts.shape
        c = self.eval_chunk
        if c <= 0 or N <= c:
            return self.decode_fn(pts)["tsdf"][..., 0]
        pad = (-N) % c
        chunks = jnp.pad(pts, ((0, 0), (0, pad), (0, 0))).reshape(B, -1, c, 3)
        chunks = chunks.transpose(1, 0, 2, 3)  # (k, B, c, 3)
        vals = jax.lax.map(lambda p: self.decode_fn(p)["tsdf"][..., 0], chunks)
        return vals.transpose(1, 0, 2).reshape(B, -1)[:, :N]

    def render_pixels(self, h_idxs, w_idxs, intrinsics, pose,
                      feature_key: str = "feat_sem") -> SurfaceRender:
        origins, dirs = pixels_to_rays(
            h_idxs.astype(jnp.float32), w_idxs.astype(jnp.float32), intrinsics, pose
        )
        depth, mask = ray_march_tsdf(
            self._tsdf, origins, dirs, self.near, self.far,
            self.n_steps, self.n_secant_steps, self.n_fine_steps,
            convention=self.convention, aabb=self.aabb,
        )
        points = origins + dirs * depth[..., None]
        out = self.decode_fn(points)
        feats = out[feature_key]
        feats = jnp.where(mask[..., None], feats, 0.0)
        return SurfaceRender(depth=depth, points=points, mask=mask, features=feats)

    def render_depth_image(self, intrinsics, pose, height: int, width: int) -> jnp.ndarray:
        """Render a full (B, H, W) depth image.

        Pixels process in chunks of n_max_network_queries // n_steps rays
        through `lax.map` — one marched chunk is the whole compiled body,
        so program size and peak memory stay bounded at any resolution
        (reference chunks the same way, renderer.py:172)."""
        B = intrinsics.shape[0]
        n = height * width
        hs, ws = jnp.meshgrid(jnp.arange(height), jnp.arange(width), indexing="ij")
        h = jnp.broadcast_to(hs.reshape(1, -1), (B, n))
        w = jnp.broadcast_to(ws.reshape(1, -1), (B, n))
        chunk = max(1, min(self.n_max_network_queries // max(self.n_steps, 1), n))
        if chunk >= n:
            render = self.render_pixels(h, w, intrinsics, pose)
            return render.depth.reshape(-1, height, width)
        pad = (-n) % chunk
        hp = jnp.pad(h, ((0, 0), (0, pad))).reshape(B, -1, chunk).transpose(1, 0, 2)
        wp = jnp.pad(w, ((0, 0), (0, pad))).reshape(B, -1, chunk).transpose(1, 0, 2)

        def do_chunk(hw):
            hc, wc = hw
            return self.render_pixels(hc, wc, intrinsics, pose).depth

        depth = jax.lax.map(do_chunk, (hp, wp))  # (n_chunks, B, chunk)
        depth = depth.transpose(1, 0, 2).reshape(B, -1)[:, :n]
        return depth.reshape(B, height, width)

    def render_feature_image(self, intrinsics, pose, height: int, width: int,
                             feature_key: str = "feat_sem"):
        """Render a full image of surface features (the reference's intended
        use of its renderer: 2D maps of the distilled semantic field,
        renderer.py:39-213). Same chunking scheme as render_depth_image.

        Returns (depth (B, H, W), mask (B, H, W) bool, feats (B, H, W, C));
        features are 0 on rays with no surface crossing."""
        B = intrinsics.shape[0]
        n = height * width
        hs, ws = jnp.meshgrid(jnp.arange(height), jnp.arange(width), indexing="ij")
        h = jnp.broadcast_to(hs.reshape(1, -1), (B, n))
        w = jnp.broadcast_to(ws.reshape(1, -1), (B, n))
        chunk = max(1, min(self.n_max_network_queries // max(self.n_steps, 1), n))
        if chunk >= n:
            r = self.render_pixels(h, w, intrinsics, pose, feature_key=feature_key)
            C = r.features.shape[-1]
            return (r.depth.reshape(B, height, width),
                    r.mask.reshape(B, height, width),
                    r.features.reshape(B, height, width, C))
        pad = (-n) % chunk
        hp = jnp.pad(h, ((0, 0), (0, pad))).reshape(B, -1, chunk).transpose(1, 0, 2)
        wp = jnp.pad(w, ((0, 0), (0, pad))).reshape(B, -1, chunk).transpose(1, 0, 2)

        def do_chunk(hw):
            hc, wc = hw
            r = self.render_pixels(hc, wc, intrinsics, pose, feature_key=feature_key)
            return r.depth, r.mask, r.features

        depth, mask, feats = jax.lax.map(do_chunk, (hp, wp))
        C = feats.shape[-1]
        depth = depth.transpose(1, 0, 2).reshape(B, -1)[:, :n]
        mask = mask.transpose(1, 0, 2).reshape(B, -1)[:, :n]
        feats = feats.transpose(1, 0, 2, 3).reshape(B, -1, C)[:, :n]
        return (depth.reshape(B, height, width),
                mask.reshape(B, height, width),
                feats.reshape(B, height, width, C))
