"""Data-parallel training on the 8-device virtual CPU mesh (the reference's
ddp_sim rig, SURVEY §2.3): sharded batches, global-semantics loss, gradient
all-reduce by XLA."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gennerf_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def _tiny_cfg():
    return {
        "type": "GenNerf", "voxel_size": 0.08,
        "voxel_dim_train": [16, 16, 8], "voxel_dim_val": [16, 16, 8],
        "voxel_dim_test": [16, 16, 8],
        "encoder": {"use_spatial": False, "use_pointnet": True,
                    "pointnet": {"num_sparse_points": 32, "c_dim": 8,
                                 "hidden_dim": 8, "plane_resolution": 16,
                                 "n_blocks": 2, "unet": False}},
        "mlp": {"d_out_sem": 1, "d_out_geo": 8, "n_blocks": 2, "d_hidden": 32},
        "ray": {"num_rays": 8, "N": 4, "M": 2, "d_min": 0.07, "delta": 0.1, "sigma": 0.1},
    }


def _batch(rng, B, T=2, H=12, W=16):
    batch = {
        "projection": rng.standard_normal((B, T, 3, 4)).astype(np.float32),
        "image": rng.standard_normal((B, T, 3, H, W)).astype(np.float32),
        "depth": (rng.random((B, T, H, W)) + 0.5).astype(np.float32),
        "pose": np.tile(np.eye(4, dtype=np.float32), (B, T, 1, 1)),
        "intrinsics": np.tile((np.eye(3) * 10).astype(np.float32), (B, T, 1, 1)),
        "vol_08_tsdf": rng.uniform(-1, 1, (B, 1, 16, 16, 8)).astype(np.float32),
    }
    batch["projection"][:, :, 2, 2] = 1.0
    return batch


class TestDataParallel:
    def test_sharded_train_step_runs_and_matches_replicated(self, rng):
        """The same global batch must give (numerically close) identical
        loss/params whether sharded over 8 devices or run on 1 — jit
        global semantics make DP a pure layout choice."""
        from gennerf_tpu.train.tasks import GenNerfTask

        assert jax.device_count() == 8
        task = GenNerfTask(_tiny_cfg())
        batch = _batch(rng, B=8)
        key = jax.random.PRNGKey(0)
        state = task.init_state(jax.random.PRNGKey(1), batch)

        mesh8 = make_mesh(8)
        state8 = replicate(state, mesh8)
        sharded = shard_batch(batch, mesh8)
        s8, m8 = task.run_train_step(state8, sharded, key)

        mesh1 = make_mesh(1)
        state1 = replicate(state, mesh1)
        local = shard_batch(batch, mesh1)
        s1, m1 = task.run_train_step(state1, local, key)

        assert np.isfinite(float(m8["combined"]))
        np.testing.assert_allclose(
            float(m8["combined"]), float(m1["combined"]), rtol=1e-4
        )
        # parameters after the step agree (the all-reduced gradient is the
        # same global gradient)
        p8 = jax.tree.leaves(s8.params)
        p1 = jax.tree.leaves(s1.params)
        for a, b in zip(p8, p1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)

    def test_hybrid_slice_mesh_matches_flat(self, rng):
        """Multi-slice (DCN x ICI) layout: the same global batch sharded
        over a 2x4 ('slice', 'data') hybrid mesh gives the same loss and
        updated params as the flat 8-device mesh — the hybrid layout only
        changes HOW XLA decomposes the gradient all-reduce (intra-slice
        ICI reduce + inter-slice DCN reduce), not WHAT is computed."""
        from gennerf_tpu.parallel.mesh import make_hybrid_mesh

        from gennerf_tpu.train.tasks import GenNerfTask

        assert jax.device_count() == 8
        task = GenNerfTask(_tiny_cfg())
        batch = _batch(rng, B=8)
        key = jax.random.PRNGKey(0)
        state = task.init_state(jax.random.PRNGKey(1), batch)

        hybrid = make_hybrid_mesh(num_slices=2)
        assert hybrid.shape == {"slice": 2, "data": 4}
        sh = replicate(state, hybrid)
        sharded = shard_batch(batch, hybrid)
        s_h, m_h = task.run_train_step(sh, sharded, key)

        mesh8 = make_mesh(8)
        s_f, m_f = task.run_train_step(
            replicate(state, mesh8), shard_batch(batch, mesh8), key
        )
        np.testing.assert_allclose(
            float(m_h["combined"]), float(m_f["combined"]), rtol=1e-4
        )
        for a, b in zip(jax.tree.leaves(s_h.params), jax.tree.leaves(s_f.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)

    def test_point_sharded_decode(self, rng):
        """Dense decode with the query-point axis sharded over the mesh."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gennerf_tpu.models import GenNerf
        from gennerf_tpu.models.config import GenNerfConfig, config_from_dict
        from gennerf_tpu.models.gen_nerf import GenNerf as _G
        from gennerf_tpu.train.predict import decode_dense
        from gennerf_tpu.train.tasks import GenNerfTask

        task = GenNerfTask(_tiny_cfg())
        batch = _batch(rng, B=1)
        state = task.init_state(jax.random.PRNGKey(0), batch)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        repr_, _ = task.model.apply(
            variables,
            jnp.asarray(batch["projection"]), jnp.asarray(batch["image"]),
            jnp.asarray(batch["depth"]), jax.random.PRNGKey(0), (16, 16, 8),
            jnp.zeros(3), train=False, method=_G.encode, mutable=["batch_stats"],
        )
        mesh = make_mesh(8)
        pts = jnp.asarray(rng.uniform(-0.5, 0.5, (8 * 512, 3)).astype(np.float32))
        pts_sharded = jax.device_put(pts, NamedSharding(mesh, P("data", None)))
        tsdf = decode_dense(task.model, variables, repr_, pts_sharded, jnp.zeros(3), chunk_size=1024)
        tsdf_local = decode_dense(task.model, variables, repr_, pts, jnp.zeros(3), chunk_size=1024)
        np.testing.assert_allclose(np.asarray(tsdf), np.asarray(tsdf_local), atol=1e-5)


class TestVoxelNetDataParallel:
    def test_voxelnet_sharded_step_matches_single_device(self, rng):
        """The second model family under the 8-device mesh: VoxelNet's
        spatial encoder carries BatchNorm, whose statistics are GLOBAL
        under jit — sharding the batch must not change them (the SyncBN
        parity claim, SURVEY §5.8), so loss and updated params match the
        single-device run."""
        from gennerf_tpu.train.tasks import VoxelNetTask

        assert jax.device_count() == 8
        cfg = {
            "type": "VoxelNet", "voxel_size": 0.08,
            "voxel_dim_train": [16, 16, 8], "voxel_dim_val": [16, 16, 8],
            "voxel_dim_test": [16, 16, 8],
            "encoder": {"use_spatial": True, "use_pointnet": False,
                        "spatial": {"backbone": "resnet18", "num_layers": 2,
                                    "blur_image": False}},
            "backbone3d": {"channels": [8, 16], "layers_down": [1, 1],
                           "layers": [1]},
            "heads": {"tsdf_multi_scale": False},
        }
        task = VoxelNetTask(cfg)
        B, T, H, W = 8, 2, 16, 16
        batch = {
            "projection": rng.standard_normal((B, T, 3, 4)).astype(np.float32),
            "image": rng.standard_normal((B, T, 3, H, W)).astype(np.float32),
            "depth": (rng.random((B, T, H, W)) + 0.5).astype(np.float32),
            "vol_08_tsdf": rng.uniform(-1, 1, (B, 1, 16, 16, 8)).astype(np.float32),
        }
        batch["projection"][:, :, 2, 2] = 1.0
        key = jax.random.PRNGKey(0)
        state = task.init_state(jax.random.PRNGKey(1), batch)

        mesh8 = make_mesh(8)
        s8, m8 = task.run_train_step(
            replicate(state, mesh8), shard_batch(batch, mesh8), key)
        mesh1 = make_mesh(1)
        s1, m1 = task.run_train_step(
            replicate(state, mesh1), shard_batch(batch, mesh1), key)

        assert np.isfinite(float(m8["tsdf_loss"]))
        np.testing.assert_allclose(
            float(m8["tsdf_loss"]), float(m1["tsdf_loss"]), rtol=1e-4)
        for a, b in zip(jax.tree.leaves(s8.params), jax.tree.leaves(s1.params)):
            # reduction order differs across layouts; Adam's m/sqrt(v)
            # normalization amplifies that noise to O(lr) for elements
            # whose gradient is ~0 — bound the param delta by the step
            # size rather than float epsilon
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=3e-3)
        # the globally-synced BatchNorm running stats also agree
        for a, b in zip(jax.tree.leaves(s8.batch_stats),
                        jax.tree.leaves(s1.batch_stats)):
            # same global statistics, layout-order float noise only
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)
