#!/usr/bin/env python3
"""Trained-model TSDF-L1 parity: the torch reference math vs the flax model
trained end-to-end on the same scene from ported-identical init
(VERDICT round-2 missing #2 — the north star's quality half).

Protocol (mirrors reference process_step + configure_optimizers,
src/models/model.py:545-689, :250):
  * one synthetic sphere scene: fixed surface point cloud (pointnet input),
    dense voxel-center supervision, GT TSDF targets computed once in numpy;
  * both models train with Adam + StepLR on identical batches;
  * both run in f64 — at f32 this JAX build's default matmul precision is
    bf16-level, and f32 rounding seeds chaotic trajectory divergence that
    measures the FLOAT NOISE, not the framework semantics;
  * the torch oracle is tests/test_model_parity.TorchGenNerf with its PE
    tables rebuilt in f64 (plain attrs that .double() skips);
  * evaluation: masked TSDF L1 of the converged dense decode vs GT, plus a
    second torch seed as the reference's own run-to-run noise floor.

Remaining cross-framework trajectory divergence comes from subgradient sign
ties of the L1 loss at zero residuals (measure-zero events amplified by
Adam) — per-step gradients agree at ~1e-8 and the first ~60 losses track to
<0.3%; the converged L1 difference lands well inside the torch seed noise.

Prints one JSON object; `python scripts/local/trained_parity.py --steps N`.
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import torch

from test_model_parity import (  # torch reference-math oracle
    C_DIM, D_GEO, D_HIDDEN, D_SEM, FREQ_FACTOR, HIDDEN, MLP_BLOCKS,
    NUM_FREQS, PN_BLOCKS, RESO, UNET_DEPTH, UNET_FILTS, TorchGenNerf,
    t_smooth_log,
)

from gennerf_tpu.models.config import (
    GenNerfConfig, OptimizerConfig, SchedulerConfig, config_from_dict,
)
from gennerf_tpu.models.gen_nerf import GenNerf, SceneRepr
from gennerf_tpu.ops.value_transforms import smooth_log_transform
from gennerf_tpu.train.state import (
    create_train_state, lr_for_epoch, make_optimizer, set_learning_rate,
)
from gennerf_tpu.utils.port_gen_nerf import merge_params, port_gen_nerf_params

# schedule calibrated in round 3: decay before L1-kink chaos amplifies
STEPS, LR, STEP_SIZE, GAMMA = 500, 1e-3, 100, 0.2
SHIFT, BETA = 1.0, 1.0


def build_scene():
    nx, ny, nz, vs = 16, 16, 8, 0.0625
    origin = np.array([-0.5, -0.5, -0.25], np.float64)
    r = 0.22
    ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij")
    centers = origin + (np.stack([ii, jj, kk], -1) + 0.5) * vs
    gt = np.clip((np.linalg.norm(centers, axis=-1) - r) / (3 * vs), -1, 1)
    n_cloud = 64
    idx = np.arange(n_cloud) + 0.5
    phi = np.arccos(1 - 2 * idx / n_cloud)
    th = np.pi * (1 + 5**0.5) * idx
    cloud = (r * np.stack([np.sin(phi) * np.cos(th),
                           np.sin(phi) * np.sin(th), np.cos(phi)], -1))[None]
    xyz = centers.reshape(1, -1, 3)
    trgt = gt.reshape(1, -1, 1)
    return dict(nx=nx, ny=ny, nz=nz, vs=vs, gt=gt, cloud=cloud, xyz=xyz,
                trgt=trgt)


def build_scene_room():
    """Room-interior variant: GT is the truncated signed distance of a
    one-sided wall shell seen from inside (positive in the room air,
    negative beyond the walls — the fusion convention for interior
    captures); the pointnet cloud samples the interior wall faces. Same
    grid/shapes as the sphere protocol so everything downstream is
    unchanged."""
    nx, ny, nz, vs = 16, 16, 8, 0.0625
    origin = np.array([-0.5, -0.5, -0.25], np.float64)
    half = np.array([0.4, 0.4, 0.2])  # wall half-extents inside the volume
    ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij")
    centers = origin + (np.stack([ii, jj, kk], -1) + 0.5) * vs
    q = np.abs(centers) - half  # box SDF: negative inside the shell
    box_sdf = (np.linalg.norm(np.maximum(q, 0.0), axis=-1)
               + np.minimum(q.max(axis=-1), 0.0))
    gt = np.clip(-box_sdf / (3 * vs), -1, 1)  # + air, - behind walls
    # 64 cloud points spread over the 6 interior faces (deterministic)
    rng = np.random.default_rng(0)
    pts = []
    for i in range(64):
        face = i % 6
        ax, sign = face // 2, (1.0 if face % 2 else -1.0)
        p = rng.uniform(-1.0, 1.0, 3) * half
        p[ax] = sign * half[ax]
        pts.append(p)
    cloud = np.asarray(pts, np.float64)[None]
    xyz = centers.reshape(1, -1, 3)
    trgt = gt.reshape(1, -1, 1)
    return dict(nx=nx, ny=ny, nz=nz, vs=vs, gt=gt, cloud=cloud, xyz=xyz,
                trgt=trgt)


def make_oracle(seed: int):
    torch.manual_seed(seed)
    oracle = TorchGenNerf(C_DIM, HIDDEN, PN_BLOCKS, RESO, UNET_DEPTH,
                          UNET_FILTS, D_HIDDEN, MLP_BLOCKS, D_GEO, D_SEM,
                          NUM_FREQS, FREQ_FACTOR)
    # copy() — torch optimizers update parameters IN PLACE and .numpy()
    # views share their storage
    sd = {k: v.detach().numpy().copy() for k, v in oracle.state_dict().items()}
    oracle = oracle.double()
    # PE tables are plain attrs (not buffers): rebuild in f64 so pi/2 isn't
    # f32-rounded
    freqs = FREQ_FACTOR * 2.0 ** torch.arange(NUM_FREQS, dtype=torch.float64)
    oracle._freqs = torch.repeat_interleave(freqs, 2).view(1, -1, 1)
    phases = torch.zeros(2 * NUM_FREQS, dtype=torch.float64)
    phases[1::2] = np.pi * 0.5
    oracle._phases = phases.view(1, -1, 1)
    return oracle, sd


def train_torch(oracle, scene, steps=STEPS):
    cloud_t = torch.from_numpy(scene["cloud"])
    xyz_t = torch.from_numpy(scene["xyz"])
    trgt_t = torch.from_numpy(scene["trgt"])
    opt = torch.optim.Adam(oracle.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=STEP_SIZE, gamma=GAMMA)
    curve = []
    for _ in range(steps):
        planes = oracle.pointnet(cloud_t)
        out = oracle.decode(planes, xyz_t)
        loss = (t_smooth_log(out["tsdf"], SHIFT, BETA)
                - t_smooth_log(trgt_t, SHIFT, BETA)).abs().mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        curve.append(float(loss.detach()))
    return curve


def eval_torch(oracle, scene):
    pts = scene["xyz"]
    with torch.no_grad():
        planes = oracle.pointnet(torch.from_numpy(scene["cloud"]))
        pred = oracle.decode(planes, torch.from_numpy(pts))["tsdf"].numpy()
    return pred.reshape(scene["gt"].shape)


def build_flax(scene, sd):
    nx, ny, nz, vs = scene["nx"], scene["ny"], scene["nz"], scene["vs"]
    cfg = config_from_dict(GenNerfConfig, {
        "voxel_size": vs,
        "voxel_dim_train": [nx, ny, nz], "voxel_dim_val": [nx, ny, nz],
        "voxel_dim_test": [nx, ny, nz],
        "encoder": {"use_spatial": False, "use_pointnet": True,
                    "pointnet": {"num_sparse_points": 64, "c_dim": C_DIM,
                                 "hidden_dim": HIDDEN, "plane_resolution": RESO,
                                 "n_blocks": PN_BLOCKS, "unet": True,
                                 "unet_depth": UNET_DEPTH,
                                 "unet_start_filts": UNET_FILTS,
                                 "scatter_type": "max"}},
        "mlp": {"d_out_sem": D_SEM, "d_out_geo": D_GEO,
                "n_blocks": MLP_BLOCKS, "d_hidden": D_HIDDEN},
        "code": {"num_freqs": NUM_FREQS, "freq_factor": FREQ_FACTOR},
    })
    model = GenNerf(cfg, dtype=jnp.float64)
    proj = jnp.zeros((1, 1, 3, 4), jnp.float32).at[:, :, 2, 2].set(1.0)
    variables = model.init(
        jax.random.PRNGKey(0), proj, jnp.zeros((1, 1, 3, 8, 8), jnp.float32),
        jnp.ones((1, 1, 8, 8), jnp.float32), jnp.zeros((1, 8, 3), jnp.float32),
        jax.random.PRNGKey(1), (nx, ny, nz), jnp.zeros(3), train=False)
    params = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float64),
        merge_params(variables["params"], port_gen_nerf_params(sd, cfg)))
    return model, cfg, params


def train_flax(model, params, scene, steps=STEPS):
    cloud_j = jnp.asarray(scene["cloud"], jnp.float64)
    xyz_j = jnp.asarray(scene["xyz"], jnp.float64)
    trgt_j = jnp.asarray(scene["trgt"], jnp.float64)
    opt_cfg = OptimizerConfig(lr=LR)
    sched_cfg = SchedulerConfig(type="StepLR", step_size=STEP_SIZE, gamma=GAMMA)
    tx = make_optimizer(opt_cfg)
    state = create_train_state({"params": params, "batch_stats": {}}, tx)

    def loss_fn(p):
        v = {"params": p, "batch_stats": {}}
        planes = model.apply(v, cloud_j, method=lambda m, c: m.pointnet(c))
        repr_ = SceneRepr(volume=None, valid=None, planes=planes)
        out = model.apply(v, repr_, xyz_j, jnp.zeros(3), method=GenNerf.decode)
        return jnp.abs(
            smooth_log_transform(out["tsdf"], SHIFT, BETA)
            - smooth_log_transform(trgt_j, SHIFT, BETA)).mean()

    import optax

    @jax.jit
    def step_fn(state):
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return state.replace(step=state.step + 1,
                             params=optax.apply_updates(state.params, updates),
                             opt_state=new_opt), loss

    curve = []
    for step in range(steps):
        state = state.replace(opt_state=set_learning_rate(
            state.opt_state, lr_for_epoch(opt_cfg, sched_cfg, step)))
        state, loss = step_fn(state)
        curve.append(float(loss))
    return state, curve


def eval_flax(model, state, scene):
    v = {"params": state.params, "batch_stats": {}}
    cloud_j = jnp.asarray(scene["cloud"], jnp.float64)
    planes = model.apply(v, cloud_j, method=lambda m, c: m.pointnet(c))
    repr_ = SceneRepr(volume=None, valid=None, planes=planes)
    pred = model.apply(v, repr_, jnp.asarray(scene["xyz"], jnp.float64),
                       jnp.zeros(3), method=GenNerf.decode)["tsdf"]
    return np.asarray(pred).reshape(scene["gt"].shape)


def masked_l1(pred, gt):
    mask = gt < 1
    return float(np.abs(pred[mask] - gt[mask]).mean())


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=STEPS)
    parser.add_argument("--scene", choices=["sphere", "room"],
                        default="sphere",
                        help="analytic GT family: the benchmarked sphere "
                             "protocol, or a room-interior shell (parity "
                             "evidence on the indoor capture regime)")
    args = parser.parse_args(argv)
    steps = args.steps

    scene = build_scene() if args.scene == "sphere" else build_scene_room()
    oracle, sd = make_oracle(seed=3)
    model, cfg, params = build_flax(scene, sd)

    curve_t = train_torch(oracle, scene, steps)
    state, curve_j = train_flax(model, params, scene, steps)

    pred_t = eval_torch(oracle, scene)
    pred_j = eval_flax(model, state, scene)
    l1_t = masked_l1(pred_t, scene["gt"])
    l1_j = masked_l1(pred_j, scene["gt"])

    # seed-noise floor: the torch reference trained from a different init
    oracle2, _ = make_oracle(seed=11)
    train_torch(oracle2, scene, steps)
    l1_t2 = masked_l1(eval_torch(oracle2, scene), scene["gt"])

    k = min(60, steps)
    early = [abs(a - b) / max(a, 1e-12) for a, b in zip(curve_t[:k], curve_j[:k])]
    result = {
        "scene": args.scene,
        "steps": steps,
        "curve_torch": [round(c, 6) for c in curve_t[:: max(steps // 10, 1)]],
        "curve_flax": [round(c, 6) for c in curve_j[:: max(steps // 10, 1)]],
        "early_track_max_rel": max(early),
        "l1_torch": l1_t,
        "l1_flax": l1_j,
        "l1_rel_diff": abs(l1_j - l1_t) / l1_t,
        "l1_abs_diff": abs(l1_j - l1_t),
        "l1_torch_seed11": l1_t2,
        "seed_noise_rel": abs(l1_t2 - l1_t) / l1_t,
        "pred_cross_mean_abs": float(np.abs(pred_t - pred_j).mean()),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
