"""Prior-first sparse inference (model.sparse_band_decode): decode only the
fusion prior's near-surface band, fill the rest with the prior's
deterministic constants. Must reproduce the dense-decode + prior-clamp
output exactly (same linspace grid positions, same decode math)."""
import jax
import jax.numpy as jnp
import numpy as np


def _cfg(**over):
    cfg = {
        "type": "GenNerf", "voxel_size": 0.08,
        "voxel_dim_train": [16, 16, 8], "voxel_dim_val": [16, 16, 8],
        "voxel_dim_test": [16, 16, 8],
        "encoder": {"use_spatial": False, "use_pointnet": True,
                    "pointnet": {"num_sparse_points": 32, "c_dim": 8,
                                 "hidden_dim": 8, "plane_resolution": 16,
                                 "n_blocks": 2, "unet": False}},
        "mlp": {"d_out_sem": 8, "d_out_geo": 8, "n_blocks": 2, "d_hidden": 16},
        "ray": {"num_rays": 8, "N": 2, "M": 1, "d_min": 0.07, "delta": 0.1,
                "sigma": 0.1},
    }
    cfg.update(over)
    return cfg


def _batch(rng, B=1, T=2, H=24, W=32):
    batch = {
        "projection": rng.standard_normal((B, T, 3, 4)).astype(np.float32),
        "image": rng.standard_normal((B, T, 3, H, W)).astype(np.float32),
        "depth": (rng.random((B, T, H, W)) + 0.5).astype(np.float32),
        "pose": np.tile(np.eye(4, dtype=np.float32), (B, T, 1, 1)),
        "intrinsics": np.tile((np.eye(3) * 20).astype(np.float32), (B, T, 1, 1)),
        "vol_08_tsdf": rng.uniform(-1, 1, (B, 1, 16, 16, 8)).astype(np.float32),
    }
    # realistic projections so the prior classes are non-trivial
    K = np.array([[20, 0, 16], [0, 20, 12], [0, 0, 1]], np.float32)
    batch["projection"][:] = K @ np.eye(4, dtype=np.float32)[:3]
    return batch


class TestSparseBandDecode:
    def test_matches_dense_plus_prior(self, rng):
        from gennerf_tpu.train.tasks import make_task

        batch = _batch(rng)
        t_dense = make_task(_cfg())
        state = t_dense.init_state(jax.random.PRNGKey(0), batch)
        pred_d, _ = t_dense.reconstruct(state, batch)
        t_sparse = make_task(_cfg(sparse_band_decode=True))
        pred_s, _ = t_sparse.reconstruct(state, batch)
        vd = np.asarray(pred_d.tsdf_vol)
        vs = np.asarray(pred_s.tsdf_vol)
        band = ~np.isin(vs, [1.0, -1.0])
        assert band.any()  # some voxels were actually decoded
        assert (~band).any()  # and most were prior-filled
        # identical up to decode-tier numerics (dense may ride the
        # separable tier; the band rides the chunked gather tier)
        np.testing.assert_allclose(vs, vd, atol=5e-6)

    def test_prior_constants_without_band(self, rng):
        """A scene whose frames never observe the volume: every voxel is the
        +1 init, zero decodes issued."""
        from gennerf_tpu.models.gen_nerf import GenNerf
        from gennerf_tpu.train.predict import predict_tsdf_volume_sparse
        from gennerf_tpu.train.tasks import make_task

        batch = _batch(rng)
        batch["depth"][:] = 0.0  # all-invalid depth: fusion writes nothing
        task = make_task(_cfg())
        state = task.init_state(jax.random.PRNGKey(0), batch)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        repr_, _ = task.model.apply(
            variables,
            jnp.asarray(batch["projection"][:1]), jnp.asarray(batch["image"][:1]),
            jnp.asarray(batch["depth"][:1]), jax.random.PRNGKey(0),
            (16, 16, 8), jnp.zeros(3), train=False,
            method=GenNerf.encode, mutable=["batch_stats"],
        )
        vol = predict_tsdf_volume_sparse(
            task.model, variables, repr_, (16, 16, 8), 0.08, np.zeros(3),
            jnp.asarray(batch["projection"][0]), jnp.asarray(batch["depth"][0]),
        )
        np.testing.assert_array_equal(np.asarray(vol), 1.0)
