"""Synthetic scene generator: builds a miniature dataset in the canonical
ScanNet layout (info.json + color/depth images + fused GT tsdf npz) from
analytic geometry. Used by tests, the overfit integration fixture, and the
benchmark harness — no ScanNet download required.

Scene: a sphere resting on a ground plane, viewed from a ring of
inward-looking cameras.
"""
from __future__ import annotations

import json
import os
import tarfile
from typing import Optional, Tuple

import numpy as np

from ..utils.image import write_png


def look_at_pose(eye, target, up=(0.0, 0.0, 1.0)) -> np.ndarray:
    """camera2world with +z forward, +y down (vision convention)."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    fwd = target - eye
    fwd /= np.linalg.norm(fwd)
    upv = np.asarray(up, np.float64)
    right = np.cross(fwd, upv)
    if np.linalg.norm(right) < 1e-6:
        right = np.cross(fwd, np.array([0.0, 1.0, 0.0]))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    pose = np.eye(4)
    pose[:3, 0] = right
    pose[:3, 1] = down
    pose[:3, 2] = fwd
    pose[:3, 3] = eye
    return pose.astype(np.float32)


def render_scene(
    H: int,
    W: int,
    intrinsics: np.ndarray,
    pose: np.ndarray,
    sphere_center=(0.0, 0.0, 0.5),
    sphere_radius: float = 0.5,
    floor_z: float = 0.0,
    max_depth: float = 10.0,
    primitives=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Analytic z-depth + shaded RGB of primitives over a floor plane.

    Rays are parameterized by camera z-depth t: X(t) = o + t * (R @ d_cam)
    with d_cam = ((u-cx)/fx, (v-cy)/fy, 1), so intersection t IS the depth.

    `primitives`: optional list of {"type": "sphere", "center", "radius"} |
    {"type": "box", "min", "max"} dicts (closest hit wins); when None the
    legacy single sphere (sphere_center/sphere_radius) renders — every
    existing caller is unchanged. Boxes are the second geometry family for
    held-out generalization beyond spheres (VERDICT round-2 next #5).

    Returns:
        depth (H, W) float32 meters (0 = no hit / beyond max_depth),
        color (H, W, 3) uint8.
    """
    fx, fy = float(intrinsics[0, 0]), float(intrinsics[1, 1])
    cx, cy = float(intrinsics[0, 2]), float(intrinsics[1, 2])
    us, vs = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    d_cam = np.stack([(us - cx) / fx, (vs - cy) / fy, np.ones_like(us)], -1)
    R = pose[:3, :3].astype(np.float64)
    o = pose[:3, 3].astype(np.float64)
    d = d_cam @ R.T  # (H, W, 3)

    if primitives is None:
        primitives = [
            {"type": "sphere", "center": sphere_center, "radius": sphere_radius}
        ]

    def hit_sphere(center, radius):
        c = np.asarray(center, np.float64)
        oc = o - c
        a = (d**2).sum(-1)
        b = (d * oc).sum(-1)
        disc = b**2 - a * ((oc**2).sum() - radius**2)
        hit = disc > 0
        sqrt_disc = np.sqrt(np.where(hit, disc, 0.0))
        t = np.where(hit, (-b - sqrt_disc) / a, np.inf)
        t = np.where(t > 1e-6, t, np.inf)
        with np.errstate(invalid="ignore"):
            pts = o + t[..., None] * d
            n = pts - c
            n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
        return t, n

    def hit_box(bmin, bmax):
        bmin = np.asarray(bmin, np.float64)
        bmax = np.asarray(bmax, np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / d  # (H, W, 3); +-inf on axis-parallel rays is fine
            t0 = (bmin - o) * inv
            t1 = (bmax - o) * inv
        t_near_ax = np.minimum(t0, t1)
        t_far_ax = np.maximum(t0, t1)
        t_near = t_near_ax.max(-1)
        t_far = t_far_ax.min(-1)
        hit = (t_far > np.maximum(t_near, 1e-6)) & (t_near > 1e-6)
        t = np.where(hit, t_near, np.inf)
        # normal: the axis achieving t_near, sign opposing the ray
        axis = np.argmax(t_near_ax, axis=-1)
        n = np.zeros(d.shape)
        for a_i in range(3):
            sel = axis == a_i
            n[sel, a_i] = -np.sign(d[sel, a_i])
        return t, n

    def hit_room(bmin, bmax):
        """Interior of an axis-aligned box: walls/ceiling/floor seen from
        INSIDE (the ScanNet regime — cameras in the room looking across).
        One-sided: a camera outside the shell sees no hit, so the
        generator must place cameras inside the room bounds."""
        bmin = np.asarray(bmin, np.float64)
        bmax = np.asarray(bmax, np.float64)
        if not (np.all(o > bmin) and np.all(o < bmax)):
            return np.full((H, W), np.inf), np.zeros((H, W, 3))
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / d
            t0 = (bmin - o) * inv
            t1 = (bmax - o) * inv
        t_far_ax = np.maximum(t0, t1)
        t_far = t_far_ax.min(-1)  # exit face = the visible wall
        t = np.where(t_far > 1e-6, t_far, np.inf)
        axis = np.argmin(t_far_ax, axis=-1)
        n = np.zeros(d.shape)
        for a_i in range(3):
            sel = axis == a_i
            n[sel, a_i] = -np.sign(d[sel, a_i])  # inward, opposing the ray
        return t, n

    def hit_cylinder(center, radius, z0, z1):
        """Vertical (z-axis) capped cylinder; center = (cx, cy)."""
        cx, cy = float(center[0]), float(center[1])
        ocx, ocy = o[0] - cx, o[1] - cy
        a = d[..., 0] ** 2 + d[..., 1] ** 2
        b = d[..., 0] * ocx + d[..., 1] * ocy
        c = ocx**2 + ocy**2 - radius**2
        with np.errstate(invalid="ignore", divide="ignore"):
            disc = b**2 - a * c
            hit_side = (disc > 0) & (a > 1e-12)
            sqrt_disc = np.sqrt(np.where(hit_side, disc, 0.0))
            t_side = np.where(hit_side, (-b - sqrt_disc) / np.where(a > 1e-12, a, 1.0), np.inf)
        t_side = np.where(t_side > 1e-6, t_side, np.inf)
        with np.errstate(invalid="ignore"):  # inf*0 -> NaN fails the band test
            z_hit = o[2] + t_side * d[..., 2]
        t_side = np.where((z_hit >= z0) & (z_hit <= z1), t_side, np.inf)

        dz = d[..., 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            t_caps = [
                np.where(np.abs(dz) > 1e-9, (zc - o[2]) / dz, np.inf)
                for zc in (z0, z1)
            ]
        t_cap = np.full((H, W), np.inf)
        cap_sign = np.zeros((H, W))
        for zc, tc in zip((z0, z1), t_caps):
            tc = np.where(tc > 1e-6, tc, np.inf)
            with np.errstate(invalid="ignore"):  # inf*0 -> NaN: not inside
                px_ = o[0] + tc * d[..., 0] - cx
                py_ = o[1] + tc * d[..., 1] - cy
                inside = px_**2 + py_**2 <= radius**2
            tc = np.where(inside, tc, np.inf)
            closer = tc < t_cap
            t_cap = np.where(closer, tc, t_cap)
            cap_sign = np.where(closer, -np.sign(dz), cap_sign)

        t = np.minimum(t_side, t_cap)
        side_hit = t_side <= t_cap
        with np.errstate(invalid="ignore"):
            pts = o + np.where(np.isfinite(t), t, 0.0)[..., None] * d
            n_side = np.stack([pts[..., 0] - cx, pts[..., 1] - cy,
                               np.zeros((H, W))], -1)
            n_side /= np.maximum(np.linalg.norm(n_side, axis=-1, keepdims=True), 1e-9)
        n_cap = np.zeros((H, W, 3))
        n_cap[..., 2] = cap_sign
        n = np.where(side_hit[..., None], n_side, n_cap)
        return t, n

    t_best = np.full((H, W), np.inf)
    n_best = np.zeros((H, W, 3))
    kind = np.full((H, W), -1, np.int64)  # primitive index; -1 = none
    for pi, prim in enumerate(primitives):
        if prim["type"] == "sphere":
            t_p, n_p = hit_sphere(prim["center"], prim["radius"])
        elif prim["type"] == "box":
            t_p, n_p = hit_box(prim["min"], prim["max"])
        elif prim["type"] == "cylinder":
            t_p, n_p = hit_cylinder(prim["center"], prim["radius"],
                                    prim["z0"], prim["z1"])
        elif prim["type"] == "room":
            t_p, n_p = hit_room(prim["min"], prim["max"])
        else:
            raise ValueError(prim["type"])
        closer = t_p < t_best
        t_best = np.where(closer, t_p, t_best)
        n_best = np.where(closer[..., None], n_p, n_best)
        kind = np.where(closer, pi, kind)

    # floor
    dz = d[..., 2]
    with np.errstate(divide="ignore"):  # dz==0 branch unused via where
        t_f = np.where(np.abs(dz) > 1e-9, (floor_z - o[2]) / dz, np.inf)
    t_f = np.where(t_f > 1e-6, t_f, np.inf)

    t = np.minimum(t_best, t_f)
    prim_closer = t_best <= t_f
    valid = np.isfinite(t) & (t <= max_depth)
    depth = np.where(valid, t, 0.0).astype(np.float32)

    # shading (inf t -> NaN points; masked out below, silence the arithmetic)
    with np.errstate(invalid="ignore", over="ignore"):
        pts = o + np.where(np.isfinite(t), t, 0.0)[..., None] * d
        light = np.array([0.4, 0.3, 0.85])
        light /= np.linalg.norm(light)
        lambert = np.clip((n_best * light).sum(-1), 0.15, 1.0)
        checker = ((np.floor(pts[..., 0] * 2) + np.floor(pts[..., 1] * 2)) % 2).astype(np.float64)
    # per-primitive hue (cycled) so frames carry appearance signal
    hues = np.array([[0.9, 0.3, 0.2], [0.2, 0.7, 0.9], [0.8, 0.8, 0.2],
                     [0.5, 0.3, 0.8]])
    color = np.zeros((H, W, 3), np.float64)
    prim_rgb = hues[np.maximum(kind, 0) % len(hues)] * lambert[..., None]
    floor_rgb = np.stack([0.3 + 0.4 * checker, 0.5 + 0.3 * checker,
                          0.4 + 0.2 * checker], -1)
    color = np.where(prim_closer[..., None], prim_rgb, floor_rgb)
    color = np.where(valid[..., None], color, 0.0)
    return depth, (color * 255).astype(np.uint8)


def random_primitives(rng, family: str = "spheres", n_min: int = 1, n_max: int = 3):
    """Random scene content for a geometry family ('spheres' | 'boxes' |
    'cylinders' | 'mixed' | 'rooms'): primitives resting on/near the floor
    inside the ~3.2 m volume the generator fuses. 'mixed' cycles the three
    object types. 'rooms' is the indoor regime the reference targets
    (ScanNet): a wall shell seen from inside plus furniture-like objects —
    cameras must be INSIDE the shell (generate_scene's room camera policy
    handles it; see ROOM_CAMERA)."""
    if family == "rooms":
        hx, hy = (float(v) for v in rng.uniform(1.15, 1.5, 2))
        h = float(rng.uniform(1.5, 2.0))
        prims = [{"type": "room", "min": (-hx, -hy, 0.0), "max": (hx, hy, h)}]
        # furniture: the object families, kept clear of the walls
        for i in range(int(rng.integers(n_min, n_max + 1))):
            cx = float(rng.uniform(-(hx - 0.55), hx - 0.55))
            cy = float(rng.uniform(-(hy - 0.55), hy - 0.55))
            kind = ("boxes", "cylinders", "spheres")[i % 3]
            if kind == "spheres":
                r = float(rng.uniform(0.15, 0.3))
                prims.append({"type": "sphere", "center": (cx, cy, r),
                              "radius": r})
            elif kind == "cylinders":
                r = float(rng.uniform(0.12, 0.3))
                prims.append({"type": "cylinder", "center": (cx, cy),
                              "radius": r, "z0": 0.0,
                              "z1": float(rng.uniform(0.3, 0.9))})
            else:
                sx, sy, sz = rng.uniform(0.2, 0.6, 3)
                prims.append({"type": "box",
                              "min": (cx - sx / 2, cy - sy / 2, 0.0),
                              "max": (cx + sx / 2, cy + sy / 2, float(sz))})
        return prims
    prims = []
    n = int(rng.integers(n_min, n_max + 1))
    for i in range(n):
        cx, cy = rng.uniform(-0.9, 0.9, 2)
        kind = family if family != "mixed" else \
            ("spheres", "boxes", "cylinders")[i % 3]
        if kind == "spheres":
            r = float(rng.uniform(0.2, 0.55))
            prims.append({"type": "sphere",
                          "center": (float(cx), float(cy), r + float(rng.uniform(0.0, 0.15))),
                          "radius": r})
        elif kind == "cylinders":
            r = float(rng.uniform(0.15, 0.45))
            h = float(rng.uniform(0.3, 1.0))
            prims.append({"type": "cylinder",
                          "center": (float(cx), float(cy)),
                          "radius": r, "z0": 0.0, "z1": h})
        else:
            sx, sy, sz = rng.uniform(0.25, 0.9, 3)
            prims.append({"type": "box",
                          "min": (float(cx - sx / 2), float(cy - sy / 2), 0.0),
                          "max": (float(cx + sx / 2), float(cy + sy / 2), float(sz))})
    return prims


def generate_scene(
    out_dir: str,
    scene: str = "scene_synth0",
    num_frames: int = 24,
    H: int = 96,
    W: int = 128,
    voxel_sizes=(4, 8, 16),
    use_tar: bool = False,
    camera_radius: float = 2.2,
    camera_height: float = 1.3,
    sphere_center=(0.0, 0.0, 0.5),
    sphere_radius: float = 0.5,
    seed: int = 0,
    primitives=None,
) -> str:
    """Create <out_dir>/scans/<scene>/{info.json,color/,depth/,tsdf_XX.npz}.

    GT volumes are produced by TSDF fusion of the rendered depths (same
    recipe as the reference prep pipeline, prepare_data.py:32-149).

    Returns the info.json path.
    """
    import jax.numpy as jnp

    from ..tsdf import TSDFFusion

    rng = np.random.default_rng(seed)
    scene_dir = os.path.join(out_dir, "scans", scene)
    color_dir = os.path.join(scene_dir, "color")
    depth_dir = os.path.join(scene_dir, "depth")
    os.makedirs(color_dir, exist_ok=True)
    os.makedirs(depth_dir, exist_ok=True)

    f = 0.6 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)

    frames = []
    depths, projections, colors = [], [], []
    target = (
        np.asarray(sphere_center)
        if primitives is None
        else np.array([0.0, 0.0, 0.4])
    )
    # ROOM_CAMERA: a room shell is one-sided (walls render from inside
    # only) — clamp the camera ring inside the shell with margin and aim
    # across the room (the ScanNet capture regime)
    room = next((p for p in (primitives or []) if p["type"] == "room"), None)
    if room is not None:
        bmin = np.asarray(room["min"], np.float64)
        bmax = np.asarray(room["max"], np.float64)
        ctr = 0.5 * (bmin + bmax)
        half_xy = 0.5 * (bmax[:2] - bmin[:2])
        camera_radius = min(camera_radius, 0.65 * float(half_xy.min()))
        camera_height = min(
            camera_height, float(bmin[2] + 0.75 * (bmax[2] - bmin[2]))
        )
        target = np.array([ctr[0], ctr[1], 0.45 * (bmax[2] - bmin[2])])
    for i in range(num_frames):
        ang = 2 * np.pi * i / num_frames + 0.01 * rng.standard_normal()
        eye = np.array([
            camera_radius * np.cos(ang),
            camera_radius * np.sin(ang),
            camera_height + 0.05 * rng.standard_normal(),
        ])
        pose = look_at_pose(eye, target)
        depth, color = render_scene(H, W, K, pose, sphere_center, sphere_radius,
                                    primitives=primitives)

        img_path = os.path.join(color_dir, f"{i}.png")
        dep_path = os.path.join(depth_dir, f"{i}.png")
        write_png(img_path, color)
        write_png(dep_path, (depth * 1000).astype(np.uint16))  # mm, DEPTH_SHIFT

        frames.append({
            "file_name_image": img_path,
            "file_name_depth": dep_path,
            "intrinsics": K.tolist(),
            "pose": pose.tolist(),
        })
        proj = (K @ np.linalg.inv(pose)[:3]).astype(np.float32)
        depths.append(depth)
        projections.append(proj)
        colors.append(color.transpose(2, 0, 1).astype(np.float32))

    if use_tar:
        for d, name in [(color_dir, "color"), (depth_dir, "depth")]:
            with tarfile.open(os.path.join(d, name + ".tar"), "w") as tar:
                for i in range(num_frames):
                    tar.add(os.path.join(d, f"{i}.png"), arcname=f"{i}.png")

    # volume bounds: fixed box around the scene (floor at z=0)
    origin = np.array([-1.6, -1.6, -0.16], np.float32)
    extent = np.array([3.2, 3.2, 1.6], np.float32)

    info = {
        "dataset": "synthetic",
        "scene": scene,
        "path": scene_dir,
        "frames": frames,
    }

    for vs_cm in voxel_sizes:
        vs = vs_cm / 100.0
        voxel_dim = tuple(int(round(e / vs)) for e in extent)
        fus = TSDFFusion(voxel_dim, vs, tuple(origin), trunc_ratio=3, color=True)
        for proj, depth, color in zip(projections, depths, colors):
            fus.integrate(jnp.asarray(proj), jnp.asarray(depth), jnp.asarray(color))
        tsdf = fus.get_tsdf()
        npz_path = os.path.join(scene_dir, f"tsdf_{vs_cm:02d}.npz")
        tsdf.save(npz_path)
        info[f"file_name_vol_{vs_cm:02d}"] = npz_path
        if vs_cm == min(voxel_sizes):
            mesh_path = os.path.join(scene_dir, "mesh_gt.ply")
            tsdf.get_mesh().export(mesh_path)
            info["file_name_mesh_gt"] = mesh_path

    info_path = os.path.join(scene_dir, "info.json")
    with open(info_path, "w") as fjson:
        json.dump(info, fjson)
    return info_path
