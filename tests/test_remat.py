"""Rematerialization (`model.remat`): numerics-identical, memory-for-FLOPs.

`remat=True` wraps the per-frame backprojection fold (GenNerf + VoxelNet
encode) in jax.checkpoint and every 3D-backbone residual block in nn.remat,
so backward recomputes those activations instead of storing them (the
volume paths dominate training HBM at reference-scale grids, SURVEY §7
"memory of the volume path"). Remat must not change a single bit of the
training math — these tests pin loss AND gradient equality against the
non-remat step from identical init.
"""
import jax
import jax.numpy as jnp
import numpy as np


def _gen_nerf_cfg(remat):
    return {
        "type": "GenNerf", "voxel_size": 0.08,
        "voxel_dim_train": [16, 16, 8], "voxel_dim_val": [16, 16, 8],
        "voxel_dim_test": [16, 16, 8],
        "remat": remat,
        "encoder": {"use_spatial": True, "use_pointnet": True,
                    "spatial": {"backbone": "resnet18", "num_layers": 2,
                                "blur_image": False},
                    "pointnet": {"num_sparse_points": 32, "c_dim": 8,
                                 "hidden_dim": 8, "plane_resolution": 16,
                                 "n_blocks": 2, "unet": False}},
        "mlp": {"d_out_sem": 8, "d_out_geo": 8, "n_blocks": 2, "d_hidden": 16},
        "ray": {"num_rays": 8, "N": 2, "M": 1, "d_min": 0.07, "delta": 0.1,
                "sigma": 0.1},
    }


def _voxel_cfg(remat):
    return {
        "type": "VoxelNet", "voxel_size": 0.08,
        "voxel_dim_train": [16, 16, 16], "voxel_dim_val": [16, 16, 16],
        "voxel_dim_test": [16, 16, 16],
        "remat": remat,
        "encoder": {"use_spatial": True, "use_pointnet": False,
                    "spatial": {"backbone": "resnet18", "num_layers": 2,
                                "blur_image": False}},
        "backbone3d": {"channels": [8, 16], "layers_down": [1, 2],
                       "layers": [2]},
        "heads": {"tsdf_multi_scale": False},
    }


def _batch(rng, vol_shape):
    B, T, H, W = 1, 2, 32, 32
    batch = {
        "projection": rng.standard_normal((B, T, 3, 4)).astype(np.float32),
        "image": rng.standard_normal((B, T, 3, H, W)).astype(np.float32),
        "depth": (rng.random((B, T, H, W)) + 0.5).astype(np.float32),
        "pose": np.tile(np.eye(4, dtype=np.float32), (B, T, 1, 1)),
        "intrinsics": np.tile((np.eye(3) * 20).astype(np.float32), (B, T, 1, 1)),
        "vol_08_tsdf": rng.uniform(-1, 1, (B, 1) + vol_shape).astype(np.float32),
    }
    batch["projection"][:, :, 2, 2] = 1.0
    return batch


def _run_two_steps(cfg_fn, rng_seed=0, vol_shape=(16, 16, 8)):
    from gennerf_tpu.train.tasks import make_task

    out = {}
    for remat in (False, True):
        rng = np.random.default_rng(rng_seed)
        batch = _batch(rng, vol_shape)
        task = make_task(cfg_fn(remat))
        state = task.init_state(jax.random.PRNGKey(0), batch)
        state, m1 = task.run_train_step(state, batch, jax.random.PRNGKey(1))
        state, m2 = task.run_train_step(state, batch, jax.random.PRNGKey(2))
        out[remat] = (state, m1, m2)
    return out


def _assert_identical(out):
    (s0, a1, a2), (s1, b1, b2) = out[False], out[True]
    for k in a1:
        np.testing.assert_allclose(float(a1[k]), float(b1[k]), rtol=0, atol=0,
                                   err_msg=f"step1 {k}")
        np.testing.assert_allclose(float(a2[k]), float(b2[k]), rtol=0, atol=0,
                                   err_msg=f"step2 {k}")
    # two Adam steps compare params -> gradients were bitwise identical too
    flat0 = jax.tree_util.tree_leaves_with_path(s0.params)
    flat1 = dict(
        (jax.tree_util.keystr(p), l)
        for p, l in jax.tree_util.tree_leaves_with_path(s1.params)
    )
    for path, leaf in flat0:
        name = jax.tree_util.keystr(path)
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat1[name]),
                                      err_msg=name)


class TestRematEquivalence:
    def test_gen_nerf_remat_identical(self):
        """GenNerf: checkpointed backprojection fold == stored fold, to the
        bit, for losses and two Adam steps of parameters."""
        _assert_identical(_run_two_steps(_gen_nerf_cfg))

    def test_voxel_net_remat_identical(self):
        """VoxelNet: checkpointed fold + nn.remat'd backbone blocks preserve
        losses, gradients (via params after 2 steps), and the param tree
        structure (checkpoint compatibility)."""
        _assert_identical(_run_two_steps(_voxel_cfg, vol_shape=(16, 16, 16)))
