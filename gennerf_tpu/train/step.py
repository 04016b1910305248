"""Jit-compiled train/eval steps.

GenNerf supervision parity (reference model.py:545-689 `process_step`): the
reference loops over the T frames in Python, sampling per frame and calling
forward once per frame; here all T frames are sampled at once (vmapped
samplers over the folded B·T axis) and decoded in ONE batched MLP pass —
the per-frame means are recovered exactly (equal point counts per frame),
and the reference's sum-over-frames-of-means is `mean * T`.

Everything here is pure: (state, batch, key) -> (state, metrics). Under jit
with batch-sharded inputs the gradient all-reduce and loss reductions are
global automatically (see parallel/mesh.py).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from .. import ops
from ..models.config import GenNerfConfig, VoxelNetConfig
from ..models.gen_nerf import GenNerf, SceneRepr
from ..models.losses import calculate_loss
from ..models.voxel_net import VoxelNet
from .state import TrainState


# ---------------------------------------------------------------------------
# GenNerf supervision-point sampling
# ---------------------------------------------------------------------------

def sample_supervision_points(cfg: GenNerfConfig, batch: Dict[str, jnp.ndarray], key: jax.Array):
    """Sample world-space supervision points for every frame.

    Returns dict with:
        xyz: (BT, R_or_N, S, 3) for ray mode / (BT, N, 3) frustum mode
             flattened later by the caller;
        plus mode-specific targets (normals, grad_vec, z).
    """
    depth = batch["depth"]  # (B, T, H, W)
    intr = batch["intrinsics"]  # (B, T, 3, 3)
    pose = batch["pose"]  # (B, T, 4, 4)
    proj = batch["projection"]  # (B, T, 3, 4)
    B, T, H, W = depth.shape
    BT = B * T
    depth_bt = depth.reshape(BT, H, W)
    intr_bt = intr.reshape(BT, 3, 3)
    pose_bt = pose.reshape(BT, 4, 4)
    proj_bt = proj.reshape(BT, 3, 4)

    k_pix, k_pts = jax.random.split(key)
    out: Dict[str, Any] = {}

    if cfg.sampling_mode == "ray":
        R = cfg.ray.num_rays
        if cfg.loss.use_gradient:
            surface_map = ops.get_3d_points(depth_bt, proj_bt)  # (BT, H, W, 3)
            normals = jax.vmap(ops.estimate_pointcloud_normals)(surface_map)
            b, h, w, ok = ops.sample_valid_pixels(k_pix, depth_bt, normals, R)
            out["sampled_normals"] = normals[b, h, w]  # (BT, R, 3)
        else:
            b, h, w, ok = ops.sample_valid_depth_pixels(k_pix, depth_bt, R)
        sampled_depth = depth_bt[b, h, w]  # (BT, R)
        xyz, z = ops.sample_points_on_rays(
            k_pts, h, w, sampled_depth, intr_bt, pose_bt,
            N=cfg.ray.N, M=cfg.ray.M, delta=cfg.ray.delta,
            min_dist=cfg.ray.d_min, sigma=cfg.ray.sigma,
        )  # (BT, R, 1+N+M, 3), (BT, R, 1+N+M)
        if cfg.loss.use_gradient:
            bounds, grad_vec = ops.bounds_pc_batch(xyz, z, sampled_depth)
            out["grad_vec"] = -grad_vec  # flip (reference model.py:670)
        out["xyz"] = xyz.reshape(BT, -1, 3)
        out["z"] = z
        out["h"], out["w"] = h, w
        out["valid_pix"] = ok
        # every sample on a ray inherits its pixel's validity; backfilled
        # (invalid-depth) rays are masked out of all point-wise loss terms
        S_ray = 1 + cfg.ray.N + cfg.ray.M
        out["valid"] = jnp.broadcast_to(
            ok[:, :, None], (BT, R, S_ray)
        ).reshape(BT, R * S_ray, 1).astype(jnp.float32)
        out["points_per_frame"] = R * (1 + cfg.ray.N + cfg.ray.M)
        return out

    if cfg.sampling_mode == "frustum":
        f = cfg.frustum
        N = f.N_free + f.N_near + f.N_surf
        b, h, w, ok = ops.sample_valid_depth_pixels(k_pix, depth_bt, N)
        k_free, k_noise = jax.random.split(k_pts)
        h_free, w_free = h[:, : f.N_free], w[:, : f.N_free]
        h_near, w_near = h[:, f.N_free : f.N_free + f.N_near], w[:, f.N_free : f.N_free + f.N_near]
        h_surf, w_surf = h[:, f.N_free + f.N_near :], w[:, f.N_free + f.N_near :]

        free_xyz, _ = ops.sample_points_in_frustum(
            k_free, h_free, w_free, intr_bt, pose_bt, f.d_min, f.d_max
        )
        surface_map = ops.get_3d_points(depth_bt, proj_bt)
        surf_xyz = surface_map[b, h_surf, w_surf]
        near_xyz = surface_map[b, h_near, w_near]
        near_xyz = near_xyz + f.sigma * jax.random.normal(k_noise, near_xyz.shape, near_xyz.dtype)
        xyz = jnp.concatenate([surf_xyz, near_xyz, free_xyz], axis=1)  # (BT, N, 3)
        out["xyz"] = xyz
        # surf/near samples read the surface map -> garbage at invalid-depth
        # pixels; free-space frustum samples need no depth and stay valid
        ok_surf = ok[:, f.N_free + f.N_near :]
        ok_near = ok[:, f.N_free : f.N_free + f.N_near]
        ok_free = jnp.ones_like(ok[:, : f.N_free])
        out["valid"] = jnp.concatenate(
            [ok_surf, ok_near, ok_free], axis=1
        )[..., None].astype(jnp.float32)
        out["points_per_frame"] = N
        return out

    raise NotImplementedError(f"sampling_mode {cfg.sampling_mode}")


def gen_nerf_forward_loss(
    model: GenNerf,
    cfg: GenNerfConfig,
    params,
    batch_stats,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    voxel_dim: Tuple[int, int, int],
    train: bool,
):
    """Full process_step: encode scene, sample supervision, decode, loss.

    Returns (combined_loss, metrics_dict, new_batch_stats).
    """
    B, T = batch["image"].shape[:2]
    origin = batch.get("origin_zero", jnp.zeros(3, jnp.float32))
    variables = {"params": params, "batch_stats": batch_stats}
    k_enc, k_sample = jax.random.split(key)

    repr_, mutated = model.apply(
        variables,
        batch["projection"], batch["image"], batch["depth"],
        k_enc, voxel_dim, origin, train=train,
        method=GenNerf.encode, mutable=["batch_stats"],
    )
    new_stats = mutated.get("batch_stats", batch_stats)

    sup = sample_supervision_points(cfg, batch, k_sample)
    BT = B * T
    S = sup["points_per_frame"]
    xyz = sup["xyz"].reshape(B, T * S, 3)

    need_grad = cfg.loss.use_eikonal or cfg.loss.use_gradient
    if need_grad:
        outputs = model.apply(
            variables, repr_, xyz, origin, method=GenNerf.decode_with_grad
        )
    else:
        outputs = model.apply(variables, repr_, xyz, origin, method=GenNerf.decode)

    # targets by trilinear interpolation of the GT volume (model.py:665)
    voxel_size_cm = int(cfg.voxel_size * 100)
    tsdf_vol = batch["vol_%02d_tsdf" % voxel_size_cm]  # (B, 1, nx, ny, nz)
    targets: Dict[str, jnp.ndarray] = {
        "tsdf": ops.trilinear_interpolation(
            tsdf_vol.transpose(0, 2, 3, 4, 1), xyz, origin, cfg.voxel_size
        )
    }

    # reshape to per-frame rows (BT, S, ...) so loss semantics match the
    # reference's per-frame invocation
    outputs_bt = {
        k: v.reshape(BT, S, -1) for k, v in outputs.items() if k != "grad"
    }
    if "grad" in outputs:
        outputs_bt["grad"] = outputs["grad"].reshape(BT, S, 3)
    targets_bt = {"tsdf": targets["tsdf"].reshape(BT, S, 1)}
    if "valid" in sup:
        targets_bt["valid"] = sup["valid"]
    if cfg.loss.use_gradient:
        targets_bt["sampled_normals"] = sup["sampled_normals"]
        targets_bt["grad_vec"] = sup["grad_vec"]

    # semantic distillation toward the 2D teacher at surface samples
    extra_metrics: Dict[str, jnp.ndarray] = {}
    distill_on = cfg.loss.use_distill and model.teacher is not None
    if distill_on and cfg.loss.distill.mode == "surface" and cfg.sampling_mode == "ray":
        from ..models.teacher import sample_teacher_features

        H, W = batch["image"].shape[-2:]
        images_bt = batch["image"].reshape(BT, 3, H, W)
        tmap = model.teacher(images_bt)  # (BT, C, H', W')
        targets_bt["teacher_feat"] = sample_teacher_features(
            tmap, sup["h"], sup["w"], (H, W)
        )
        targets_bt["teacher_mask"] = sup["valid_pix"][..., None].astype(jnp.float32)
        S_ray = 1 + cfg.ray.N + cfg.ray.M
        outputs_bt["feat_sem_surface"] = outputs["feat_sem"].reshape(
            BT, cfg.ray.num_rays, S_ray, -1
        )[:, :, 0]
    elif distill_on and cfg.loss.distill.mode == "render":
        # render-based distillation (the reference's aspirational design —
        # its UNISURF renderer prototype was built for this and never
        # wired, renderer.py:39-213): march rays through the CURRENT
        # decoded TSDF field, decode e_sem at the marched crossings, and
        # supervise with the teacher at those pixels. Geometry is
        # stop-gradient (UNISURF appearance-at-fixed-geometry); the TSDF
        # terms keep owning the geometry. Works under any sampling_mode.
        from ..models.renderer import pixels_to_rays, ray_march_tsdf
        from ..models.teacher import sample_teacher_features

        dcfg = cfg.loss.distill
        H, W = batch["image"].shape[-2:]
        depth_bt = batch["depth"].reshape(BT, H, W)
        intr_bt = batch["intrinsics"].reshape(BT, 3, 3)
        pose_bt = batch["pose"].reshape(BT, 4, 4)
        proj_bt = batch["projection"].reshape(BT, 3, 4)
        images_bt = batch["image"].reshape(BT, 3, H, W)

        k_render = jax.random.fold_in(k_sample, 7)
        Rr = dcfg.render_rays
        # rays through pixels with valid GT depth: a surface demonstrably
        # exists along them, so hit-mask attrition stays low
        _, h_r, w_r, ok_r = ops.sample_valid_depth_pixels(k_render, depth_bt, Rr)
        origins, dirs = pixels_to_rays(
            h_r.astype(jnp.float32), w_r.astype(jnp.float32), intr_bt, pose_bt
        )  # (BT, Rr, 3)

        def field_fn(p):  # (B, N, 3) -> (B, N); forward-only march lookups
            return model.apply(variables, repr_, p, origin, method=GenNerf.decode)[
                "tsdf"
            ][..., 0]

        # clip each ray's march to the training volume box: the decoded
        # field is border-clamped outside it (see ray_aabb_clip)
        vol_size = jnp.asarray(voxel_dim, jnp.float32) * cfg.voxel_size
        depth_r, hit = ray_march_tsdf(
            field_fn,
            origins.reshape(B, T * Rr, 3),
            dirs.reshape(B, T * Rr, 3),
            near=dcfg.render_near,
            far=dcfg.render_far,
            n_steps=dcfg.render_steps,
            n_secant_steps=dcfg.render_secant,
            n_fine_steps=dcfg.render_fine,
            convention="fusion",
            aabb=(origin.astype(jnp.float32), origin.astype(jnp.float32) + vol_size),
        )
        depth_r = jax.lax.stop_gradient(depth_r)  # (B, T*Rr)
        pts_r = origins.reshape(B, T * Rr, 3) + dirs.reshape(B, T * Rr, 3) * depth_r[..., None]
        hit_bt = hit.reshape(BT, Rr)
        if dcfg.gt_warmstart:
            # no crossing yet (saturated early field) -> supervise at the
            # GT-depth surface point of the same ray; keeps the distill
            # term alive from epoch 0 (see DistillLossConfig.gt_warmstart)
            surface_map = ops.get_3d_points(depth_bt, proj_bt)  # (BT, H, W, 3)
            bidx = jnp.arange(BT)[:, None]
            pts_gt = surface_map[bidx, h_r, w_r].reshape(B, T * Rr, 3)
            pts_r = jnp.where(hit.reshape(B, T * Rr)[..., None], pts_r, pts_gt)
            mask_r = ok_r  # any valid-depth ray has a supervision point
        else:
            mask_r = ok_r & hit_bt
        out_r = model.apply(variables, repr_, pts_r, origin, method=GenNerf.decode)
        outputs_bt["feat_sem_surface"] = out_r["feat_sem"].reshape(BT, Rr, -1)

        tmap = model.teacher(images_bt)  # (BT, C, H', W')
        targets_bt["teacher_feat"] = sample_teacher_features(tmap, h_r, w_r, (H, W))
        targets_bt["teacher_mask"] = mask_r[..., None].astype(jnp.float32)
        extra_metrics["render_hit_rate"] = hit_bt.mean()

    combined, losses = calculate_loss(
        cfg.loss, outputs_bt, targets_bt, num_rays=cfg.ray.num_rays
    )
    # reference accumulates per-frame means over T (add_dicts, model.py:688);
    # coverage/rate diagnostics are fractions and stay unscaled
    metrics = {
        k: (v if k.endswith(("_coverage", "_rate")) else v * T)
        for k, v in losses.items()
    }
    metrics.update(extra_metrics)
    return metrics["combined"], metrics, new_stats


def make_gen_nerf_train_step(model: GenNerf, cfg: GenNerfConfig, tx: optax.GradientTransformation):
    voxel_dim = tuple(cfg.voxel_dim_train)

    @jax.jit
    def train_step(state: TrainState, batch, key):
        def loss_fn(params):
            loss, metrics, new_stats = gen_nerf_forward_loss(
                model, cfg, params, state.batch_stats, batch, key, voxel_dim, train=True
            )
            return loss, (metrics, new_stats)

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, batch_stats=new_stats, opt_state=new_opt
        )
        return new_state, metrics

    return train_step


def make_gen_nerf_eval_step(model: GenNerf, cfg: GenNerfConfig, voxel_dim=None):
    voxel_dim = tuple(voxel_dim or cfg.voxel_dim_val)

    @jax.jit
    def eval_step(state: TrainState, batch, key):
        loss, metrics, _ = gen_nerf_forward_loss(
            model, cfg, state.params, state.batch_stats, batch, key, voxel_dim, train=False
        )
        return metrics

    return eval_step


# ---------------------------------------------------------------------------
# VoxelNet steps
# ---------------------------------------------------------------------------

def _voxel_targets(batch, voxel_sizes):
    return {("vol_%02d_tsdf" % vs): batch["vol_%02d_tsdf" % vs] for vs in voxel_sizes}


def make_voxel_net_train_step(model: VoxelNet, cfg: VoxelNetConfig, tx: optax.GradientTransformation):
    voxel_dim = tuple(cfg.voxel_dim_train)
    final = int(cfg.voxel_size * 100)
    voxel_sizes = [final * 2**i for i in range(len(cfg.backbone3d.channels) - 1)]

    @jax.jit
    def train_step(state: TrainState, batch, key):
        origin = jnp.zeros(3, jnp.float32)
        targets = _voxel_targets(batch, voxel_sizes)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (outputs, losses), mutated = model.apply(
                variables,
                batch["projection"], batch["image"], batch["depth"],
                voxel_dim, origin, targets, train=True,
                mutable=["batch_stats"], rngs={"dropout": key},
            )
            loss = sum(losses.values())
            return loss, (losses, mutated.get("batch_stats", state.batch_stats))

        (loss, (losses, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["tsdf_loss"] = loss
        new_state = TrainState(
            step=state.step + 1, params=params, batch_stats=new_stats, opt_state=new_opt
        )
        return new_state, metrics

    return train_step


def make_voxel_net_eval_step(model: VoxelNet, cfg: VoxelNetConfig, voxel_dim=None):
    voxel_dim = tuple(voxel_dim or cfg.voxel_dim_val)
    final = int(cfg.voxel_size * 100)
    voxel_sizes = [final * 2**i for i in range(len(cfg.backbone3d.channels) - 1)]

    @jax.jit
    def eval_step(state: TrainState, batch, key):
        origin = jnp.zeros(3, jnp.float32)
        targets = _voxel_targets(batch, voxel_sizes)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        outputs, losses = model.apply(
            variables,
            batch["projection"], batch["image"], batch["depth"],
            voxel_dim, origin, targets, train=False,
        )
        metrics = dict(losses)
        metrics["tsdf_loss"] = sum(losses.values())
        return metrics

    return eval_step
