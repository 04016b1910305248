#!/usr/bin/env python3
"""Trained-model parity for the SECOND model family: torch reference
VoxelNet math vs the flax stack, trained end-to-end from ported-identical
init (the companion of trained_parity.py, which pins GenNerf).

Protocol (mirrors reference voxel_net.py:147-352 + heads3d.py:84-176):
  * a fixed backprojected-style feature volume (sphere-distance features,
    one slab zeroed so the conditional skip projections are exercised) and
    fusion-convention sphere GT TSDF volumes at both head scales;
  * torch oracle = tests/test_model_parity.{TEncoderDecoder,TVoxelNetHead}
    (reference module names) trained with Adam + StepLR on the summed
    multi-scale masked log-L1 (loss_split='pred' sparsification live);
  * the flax EncoderDecoder + VoxelHeads train from the SAME init (weight
    porter) with the same optimizer; BOTH in f64 and BOTH in train mode
    (BatchNorm batch statistics — the training operator under test
    includes conv/BN/trilinear-resize autodiff and the coarse-to-fine
    pred-mask);
  * converged compare: per-scale training losses + mean |pred diff| of the
    fine volume, with a second torch seed as the reference's own
    run-to-run noise floor.

Prints one JSON object; `python scripts/local/trained_parity_voxelnet.py
--steps N`.
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
    TEncoderDecoder, TVoxelNetHead, t_tsdf_head_forward,
)

from gennerf_tpu.models.backbone3d import EncoderDecoder
from gennerf_tpu.models.heads import VoxelHeads
from gennerf_tpu.train.state import (
    lr_for_epoch, make_optimizer, set_learning_rate,
)
from gennerf_tpu.models.config import OptimizerConfig, SchedulerConfig
from gennerf_tpu.utils.port_gen_nerf import port_backbone3d, port_voxel_heads
from gennerf_tpu.utils.port_torch import _merge_checked

STEPS, LR, STEP_SIZE, GAMMA = 300, 1e-3, 100, 0.2
CHANNELS, LAYERS_DOWN, LAYERS_UP = [4, 8, 16], [1, 2, 2], [2, 2]
VOXEL_SIZES = [16, 8]  # coarse -> fine (cm)


def build_scene():
    """Fixed input feature volume + sphere GT at both scales (f64)."""
    B, nx, ny, nz, vs = 1, 16, 16, 8, 0.08
    r = 0.25
    c = np.array([0.64, 0.64, 0.32])

    def sphere_tsdf(n):
        s = nx // n[0]
        xs, ys, zs = np.meshgrid(*(np.arange(k) * vs * s for k in n), indexing="ij")
        d = np.sqrt((xs - c[0]) ** 2 + (ys - c[1]) ** 2 + (zs - c[2]) ** 2)
        return np.clip((d - r) / (3 * vs * s), -1, 1)[None, None]

    targets = {
        "vol_16_tsdf": sphere_tsdf((nx // 2, ny // 2, nz // 2)),
        "vol_08_tsdf": sphere_tsdf((nx, ny, nz)),
    }
    # backprojected-style features: distance gaussian + coords + a constant
    xs, ys, zs = np.meshgrid(np.arange(nx) * vs, np.arange(ny) * vs,
                             np.arange(nz) * vs, indexing="ij")
    d = np.sqrt((xs - c[0]) ** 2 + (ys - c[1]) ** 2 + (zs - c[2]) ** 2)
    vol = np.stack([np.exp(-(d / r) ** 2), xs / 1.28, ys / 1.28, zs / 0.64])[None]
    vol = vol.astype(np.float64)
    vol[:, :, :3] = 0.0  # unobserved slab -> conditional skip masks engage
    return dict(vol=vol, targets={k: v.astype(np.float64) for k, v in targets.items()})


def make_oracle(seed: int):
    torch.manual_seed(seed)
    tb = TEncoderDecoder(CHANNELS, LAYERS_DOWN, LAYERS_UP)
    th = TVoxelNetHead(CHANNELS)
    sd = {"backbone3d." + k: v.detach().numpy().copy()
          for k, v in tb.state_dict().items()}
    sd.update({"heads3d." + k: v.detach().numpy().copy()
               for k, v in th.state_dict().items()})
    return tb.double(), th.double(), sd


def train_torch(tb, th, scene, steps):
    vol = torch.from_numpy(scene["vol"])
    targets = {k: torch.from_numpy(v) for k, v in scene["targets"].items()}
    tb.train(), th.train()
    opt = torch.optim.Adam(list(tb.parameters()) + list(th.parameters()), lr=LR)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=STEP_SIZE, gamma=GAMMA)
    curve = []
    for _ in range(steps):
        xs = tb(vol)
        _, losses = t_tsdf_head_forward(th, xs, VOXEL_SIZES, targets)
        loss = sum(losses.values())
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        curve.append(float(loss.detach()))
    return curve


def eval_torch(tb, th, scene):
    tb.eval(), th.eval()
    with torch.no_grad():
        xs = tb(torch.from_numpy(scene["vol"]))
        out, losses = t_tsdf_head_forward(
            th, xs, VOXEL_SIZES,
            {k: torch.from_numpy(v) for k, v in scene["targets"].items()})
    return ({k: v.numpy() for k, v in out.items()},
            {k: float(v) for k, v in losses.items()})


def build_flax(scene, sd):
    fb = EncoderDecoder(channels=CHANNELS, layers_down=LAYERS_DOWN,
                        layers_up=LAYERS_UP, norm="BN", dtype=jnp.float64)
    fh = VoxelHeads(channels=CHANNELS, voxel_size=0.08, dtype=jnp.float64)
    vol = jnp.asarray(scene["vol"])
    bvars = fb.init(jax.random.PRNGKey(0), vol, train=False)
    xs0 = fb.apply(bvars, vol, train=False)
    hvars = fh.init(jax.random.PRNGKey(0), xs0, None)

    pp, ps = port_backbone3d(sd, LAYERS_DOWN, LAYERS_UP)
    bparams = jax.tree.map(np.asarray, bvars["params"])
    bstats = jax.tree.map(np.asarray, bvars["batch_stats"])
    _merge_checked(bparams, pp)
    _merge_checked(bstats, ps)
    hp = port_voxel_heads(sd, n_scales=len(CHANNELS) - 1)
    hparams = jax.tree.map(np.asarray, hvars["params"])
    _merge_checked(hparams, hp)

    as64 = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), t)  # noqa: E731
    params = {"backbone": as64(bparams), "heads": as64(hparams)}
    stats = as64(bstats)
    return fb, fh, params, stats


def train_flax(fb, fh, params, stats, scene, steps):
    vol = jnp.asarray(scene["vol"])
    targets = {k: jnp.asarray(v) for k, v in scene["targets"].items()}
    opt_cfg = OptimizerConfig(lr=LR)
    sched_cfg = SchedulerConfig(type="StepLR", step_size=STEP_SIZE, gamma=GAMMA)
    tx = make_optimizer(opt_cfg)
    opt_state = tx.init(params)

    def loss_fn(p, st):
        xs, mut = fb.apply({"params": p["backbone"], "batch_stats": st},
                           vol, train=True, mutable=["batch_stats"])
        _, losses = fh.apply({"params": p["heads"]}, xs, targets)
        return sum(losses.values()), mut["batch_stats"]

    import optax

    @jax.jit
    def step_fn(p, st, o):
        (loss, new_st), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, st)
        updates, new_o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), new_st, new_o, loss

    curve = []
    for step in range(steps):
        opt_state = set_learning_rate(
            opt_state, lr_for_epoch(opt_cfg, sched_cfg, step))
        params, stats, opt_state, loss = step_fn(params, stats, opt_state)
        curve.append(float(loss))
    return params, stats, curve


def eval_flax(fb, fh, params, stats, scene):
    vol = jnp.asarray(scene["vol"])
    targets = {k: jnp.asarray(v) for k, v in scene["targets"].items()}
    xs = fb.apply({"params": params["backbone"], "batch_stats": stats},
                  vol, train=False)
    out, losses = fh.apply({"params": params["heads"]}, xs, targets)
    return ({k: np.asarray(v) for k, v in out.items()},
            {k: float(v) for k, v in losses.items()})


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=STEPS)
    args = parser.parse_args(argv)
    steps = args.steps

    scene = build_scene()
    tb, th, sd = make_oracle(seed=3)
    fb, fh, params, stats = build_flax(scene, sd)

    curve_t = train_torch(tb, th, scene, steps)
    params, stats, curve_j = train_flax(fb, fh, params, stats, scene, steps)

    out_t, loss_t = eval_torch(tb, th, scene)
    out_j, loss_j = eval_flax(fb, fh, params, stats, scene)

    tb2, th2, _ = make_oracle(seed=11)
    train_torch(tb2, th2, scene, steps)
    _, loss_t2 = eval_torch(tb2, th2, scene)

    k = min(60, steps)
    early = [abs(a - b) / max(a, 1e-12) for a, b in zip(curve_t[:k], curve_j[:k])]
    fine = "vol_08_tsdf"
    lt, lj = loss_t[fine + "_loss"], loss_j[fine + "_loss"]
    lt2 = loss_t2[fine + "_loss"]
    result = {
        "steps": steps,
        "curve_torch": [round(c, 6) for c in curve_t[:: max(steps // 10, 1)]],
        "curve_flax": [round(c, 6) for c in curve_j[:: max(steps // 10, 1)]],
        "early_track_max_rel": max(early),
        "fine_loss_torch": lt,
        "fine_loss_flax": lj,
        "fine_loss_rel_diff": abs(lj - lt) / max(lt, 1e-12),
        "fine_loss_abs_diff": abs(lj - lt),
        "fine_loss_torch_seed11": lt2,
        "seed_noise_rel": abs(lt2 - lt) / max(lt, 1e-12),
        "pred_cross_mean_abs": float(np.abs(out_t[fine] - out_j[fine]).mean()),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
