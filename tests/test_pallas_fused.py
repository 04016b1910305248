"""Fused Pallas decoder: correctness vs the flax ResnetFC reference path
(interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gennerf_tpu.models.heads import TSDFHeadSimple
from gennerf_tpu.models.resnetfc import ResnetFC
from gennerf_tpu.ops.pallas.fused_decoder import (
    extract_resnetfc_weights,
    fused_resnetfc_tsdf,
    supports_fused_decode,
)


@pytest.mark.parametrize("d_in,d_code,d_hidden,n_blocks,d_out_geo,d_out_sem", [
    (64, 39, 256, 5, 64, 1),   # flagship decoder
    (32, 15, 128, 3, 16, 8),
])
def test_fused_matches_flax(rng, d_in, d_code, d_hidden, n_blocks, d_out_geo, d_out_sem):
    d_out = d_out_geo + d_out_sem
    mlp = ResnetFC(d_in=d_in, d_out=d_out, n_blocks=n_blocks, d_latent=d_code,
                   d_hidden=d_hidden, dtype=jnp.bfloat16)
    head = TSDFHeadSimple()

    N = 300
    feat = jnp.asarray(rng.standard_normal((N, d_in)).astype(np.float32))
    code = jnp.asarray(rng.standard_normal((N, d_code)).astype(np.float32))
    zx = jnp.concatenate([code, feat], axis=-1)

    mlp_vars = mlp.init(jax.random.PRNGKey(0), zx[:4])
    # gently randomize so zero-init residual layers are non-trivial but the
    # tanh head stays out of saturation (where comparisons are meaningless)
    params = dict(mlp_vars["params"])
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = treedef.unflatten([
        0.05 * jax.random.normal(kk, l.shape, jnp.float32) if l.ndim > 0 else l
        for kk, l in zip(keys, leaves)
    ])
    params["alpha"] = jnp.asarray(0.8, jnp.float32)
    mlp_vars = {"params": params}

    mlp_out = mlp.apply(mlp_vars, zx)
    head_vars = head.init(jax.random.PRNGKey(1), mlp_out[:4, :d_out_geo])
    hp = dict(head_vars["params"])
    hp["Dense_0"] = dict(hp["Dense_0"])
    hp["Dense_0"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(9), hp["Dense_0"]["kernel"].shape
    )
    hp["Dense_0"]["bias"] = jnp.zeros_like(hp["Dense_0"]["bias"])
    head_vars = {"params": hp}

    tsdf_ref = head.apply(head_vars, mlp_out[:, :d_out_geo])[:, 0]

    weights = extract_resnetfc_weights(
        jax.tree.map(np.asarray, mlp_vars["params"]),
        jax.tree.map(np.asarray, head_vars["params"]),
        n_blocks, d_out_geo,
    )
    tsdf_fused = fused_resnetfc_tsdf(feat, code, weights, n_blocks, tile=128,
                                     interpret=True)
    np.testing.assert_allclose(
        np.asarray(tsdf_fused), np.asarray(tsdf_ref), atol=5e-3
    )
    c = np.corrcoef(np.asarray(tsdf_fused), np.asarray(tsdf_ref))[0, 1]
    assert c > 0.999


def test_supports_fused_decode_gates():
    from gennerf_tpu.models.config import GenNerfConfig, MlpConfig

    assert supports_fused_decode(GenNerfConfig())
    assert not supports_fused_decode(
        GenNerfConfig(mlp=MlpConfig(use_layer_norm=True))
    )
    assert not supports_fused_decode(GenNerfConfig(mlp=MlpConfig(beta=100.0)))
    assert not supports_fused_decode(GenNerfConfig(mlp=MlpConfig(combine_layer=2)))


def test_ragged_tail_padding(rng):
    """N not a multiple of the tile: padded points must not corrupt output."""
    d_in, d_code, H, n_blocks = 32, 15, 128, 2
    mlp = ResnetFC(d_in=d_in, d_out=17, n_blocks=n_blocks, d_latent=d_code,
                   d_hidden=H, dtype=jnp.bfloat16)
    head = TSDFHeadSimple()
    N = 200  # not divisible by 128
    feat = jnp.asarray(rng.standard_normal((N, d_in)).astype(np.float32))
    code = jnp.asarray(rng.standard_normal((N, d_code)).astype(np.float32))
    zx = jnp.concatenate([code, feat], -1)
    mv = mlp.init(jax.random.PRNGKey(0), zx[:4])
    out = mlp.apply(mv, zx)
    hv = head.init(jax.random.PRNGKey(1), out[:4, :16])
    # gentle head weights keep tanh linear (kernel head runs bf16; the flax
    # head is f32 — saturation magnifies the precision gap meaninglessly)
    hp = {"Dense_0": {"kernel": 0.05 * jax.random.normal(jax.random.PRNGKey(2), hv["params"]["Dense_0"]["kernel"].shape),
                      "bias": jnp.zeros_like(hv["params"]["Dense_0"]["bias"])}}
    hv = {"params": hp}
    weights = extract_resnetfc_weights(
        jax.tree.map(np.asarray, mv["params"]),
        jax.tree.map(np.asarray, hv["params"]), n_blocks, 16,
    )
    tsdf = fused_resnetfc_tsdf(feat, code, weights, n_blocks, tile=128, interpret=True)
    assert tsdf.shape == (N,)
    ref = head.apply(hv, out[:, :16])[:, 0]
    # full-scale mlp weights here -> pure bf16 rounding differences; this
    # test guards the tail-padding logic, not precision
    np.testing.assert_allclose(np.asarray(tsdf), np.asarray(ref), atol=2e-2)


class TestSeparableGridDecode:
    """The separable grid kernel: per-axis resample matrices, PE axis
    tables, and end-to-end equality with the XLA decode path."""

    def test_resample_matrix_matches_plane_sampler(self, rng):
        from gennerf_tpu.ops.coords import normalize_coordinate
        from gennerf_tpu.ops.interpolation import sample_plane_feature
        from gennerf_tpu.ops.pallas.fused_decoder import (
            _normalize_axis,
            _resample_matrix,
            _resample_plane,
        )

        reso, C = 16, 8
        plane = jnp.asarray(rng.standard_normal((1, C, reso, reso)).astype(np.float32))
        xs = jnp.linspace(-0.6, 0.6, 5)
        zs = jnp.linspace(-0.55, 0.55, 7)
        # reference: full 3D points through normalize_coordinate + bilinear
        gx, gz = jnp.meshgrid(xs, zs, indexing="ij")
        pts = jnp.stack([gx, jnp.zeros_like(gx), gz], -1).reshape(1, -1, 3)
        coords = normalize_coordinate(pts, padding=0.1, plane="xz")
        ref = sample_plane_feature(plane, coords)[0].reshape(5, 7, C)

        wx = _resample_matrix(_normalize_axis(xs, 0.1), reso)
        wz = _resample_matrix(_normalize_axis(zs, 0.1), reso)
        sep = _resample_plane(plane[0], wz, wx)  # (5, 7, C)
        np.testing.assert_allclose(np.asarray(sep), np.asarray(ref), atol=1e-5)

    def test_pe_axis_tables_sum_to_positional_encoding(self, rng):
        from gennerf_tpu.models.positional_encoding import positional_encoding
        from gennerf_tpu.ops.pallas.fused_decoder import _pe_axis_table

        for include_input in (True, False):
            xs = jnp.asarray(rng.uniform(-1, 1, 4).astype(np.float32))
            ys = jnp.asarray(rng.uniform(-1, 1, 3).astype(np.float32))
            zs = jnp.asarray(rng.uniform(-1, 1, 5).astype(np.float32))
            tabs = [
                _pe_axis_table(c, a, 6, 0.5, include_input)
                for a, c in enumerate((xs, ys, zs))
            ]
            gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
            pts = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)
            ref = positional_encoding(pts, 6, 0.5, include_input)
            sep = (
                tabs[0][:, None, None, :]
                + tabs[1][None, :, None, :]
                + tabs[2][None, None, :, :]
            ).reshape(-1, ref.shape[-1])
            np.testing.assert_allclose(np.asarray(sep), np.asarray(ref), atol=1e-6)

    def test_grid_decode_matches_xla_path(self, rng):
        import jax

        from gennerf_tpu.train.predict import (
            decode_dense,
            decode_grid_fused,
            dense_grid_points,
        )
        from gennerf_tpu.train.tasks import GenNerfTask
        from gennerf_tpu.models.gen_nerf import GenNerf

        cfg = {
            "type": "GenNerf", "voxel_size": 0.08,
            "voxel_dim_train": [16, 16, 8], "voxel_dim_val": [16, 16, 8],
            "voxel_dim_test": [16, 16, 8],
            "encoder": {"use_spatial": False, "use_pointnet": True,
                        "pointnet": {"num_sparse_points": 32, "c_dim": 8,
                                     "hidden_dim": 8, "plane_resolution": 16,
                                     "n_blocks": 2, "unet": False}},
            "mlp": {"d_out_sem": 1, "d_out_geo": 8, "n_blocks": 2, "d_hidden": 32},
        }
        task = GenNerfTask(cfg)
        B, T, H, W = 1, 2, 12, 16
        batch = {
            "projection": rng.standard_normal((B, T, 3, 4)).astype(np.float32),
            "image": rng.standard_normal((B, T, 3, H, W)).astype(np.float32),
            "depth": (rng.random((B, T, H, W)) + 0.5).astype(np.float32),
            "vol_08_tsdf": rng.uniform(-1, 1, (B, 1, 16, 16, 8)).astype(np.float32),
        }
        batch["projection"][:, :, 2, 2] = 1.0
        state = task.init_state(jax.random.PRNGKey(0), batch)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        repr_, _ = task.model.apply(
            variables,
            jnp.asarray(batch["projection"]), jnp.asarray(batch["image"]),
            jnp.asarray(batch["depth"]), jax.random.PRNGKey(0), (16, 16, 8),
            jnp.zeros(3), train=False,
            method=GenNerf.encode, mutable=["batch_stats"],
        )
        # decode grid z=64 so pick_grid_tile finds a Mosaic-legal 1024-pt tile
        voxel_dim = (16, 16, 64)
        origin = jnp.asarray([0.05, -0.1, 0.02], jnp.float32)
        # tame the feature scale: the untrained synthetic encode produces
        # plane features at scale ~300, where BOTH paths' bf16-precision
        # matmuls (this JAX build's DEFAULT f32 matmul precision is bf16-
        # level, measured 2.6e-3 rel err) drown the comparison. The table
        # math itself is exact: flax applied to table-reconstructed inputs
        # reproduces decode_dense bit-for-bit (see round-2 BENCH.md notes).
        from gennerf_tpu.models.gen_nerf import SceneRepr
        repr_ = SceneRepr(
            volume=repr_.volume, valid=repr_.valid,
            planes={k: 0.02 * v for k, v in repr_.planes.items()},
        )
        fused = decode_grid_fused(
            task.model, variables, repr_, voxel_dim, 0.08, origin, interpret=True
        )
        pts = dense_grid_points(voxel_dim, 0.08, np.asarray(origin))
        # the reference must run at true f32 (HIGHEST): the kernel's table
        # stage is exact, so comparing against the default-precision XLA
        # decode would measure the REFERENCE's bf16-level matmul noise
        with jax.default_matmul_precision("highest"):
            ref = decode_dense(task.model, variables, repr_, pts, origin).reshape(voxel_dim)
        assert fused.shape == voxel_dim
        # tolerance calibration: the kernel's residual blocks run bf16 (by
        # design — it IS the production bf16 decoder), so vs a true-f32
        # reference its error floor is ~2^-8 x |activation| x block gain
        # ~ 5e-2 here (PE injections put |x| ~ 10 at this random init).
        # The table/fold algebra is pinned EXACTLY by
        # test_projected_tables_fold_exact; this asserts end-to-end sanity.
        fa, ra = np.asarray(fused), np.asarray(ref)
        np.testing.assert_allclose(fa, ra, atol=8e-2)
        assert np.abs(fa - ra).mean() < 1e-2
        c = np.corrcoef(fa.ravel(), ra.ravel())[0, 1]
        assert c > 0.9999

    def test_projected_tables_fold_exact(self, rng):
        """The lin_in/lin_z pre-projection folds (b_in into q_yz, alpha+bz
        into z_z) reproduce feat@w_in+b_in and alpha*(code@wz+bz) exactly
        (f32 table build vs f64 direct math)."""
        from gennerf_tpu.models.positional_encoding import positional_encoding
        from gennerf_tpu.models.resnetfc import ResnetFC
        from gennerf_tpu.models.heads import TSDFHeadSimple
        from gennerf_tpu.ops.pallas.fused_decoder import (
            _grid_tables,
            _normalize_axis,
            _resample_matrix,
            _resample_plane,
            extract_resnetfc_weights,
        )

        d_in, d_code, H, n_blocks, reso = 8, 39, 32, 2, 16
        mlp = ResnetFC(d_in=d_in, d_out=9, n_blocks=n_blocks, d_latent=d_code,
                       d_hidden=H)
        head = TSDFHeadSimple()
        zx = jnp.asarray(rng.standard_normal((4, d_in + d_code)).astype(np.float32))
        mv = mlp.init(jax.random.PRNGKey(0), zx)
        params = dict(mv["params"])
        params["alpha"] = jnp.asarray(0.7, jnp.float32)
        hv = head.init(jax.random.PRNGKey(1), mlp.apply({"params": params}, zx)[:, :8])
        weights = extract_resnetfc_weights(
            jax.tree.map(np.asarray, params),
            jax.tree.map(np.asarray, hv["params"]), n_blocks, 8,
        )
        planes = {k: jnp.asarray(rng.standard_normal((d_in, reso, reso)).astype(np.float32))
                  for k in ("xz", "xy", "yz")}
        nx, ny, nz = 8, 6, 10
        vs, padding = 0.08, 0.1
        origin = jnp.asarray([0.02, -0.05, 0.01], jnp.float32)
        tabs = _grid_tables(
            planes["xz"], planes["xy"], planes["yz"], origin, weights,
            voxel_dim=(nx, ny, nz), voxel_size=vs, num_freqs=6,
            freq_factor=0.5, include_input=True, padding=padding,
        )
        q_yz, q_xz, q_xy, z_x, z_y, z_z = [np.asarray(t, np.float64) for t in tabs]

        axes = [np.linspace(0.0, vs * n, n, dtype=np.float32) + np.asarray(origin)[a]
                for a, n in enumerate((nx, ny, nz))]
        ws = [np.asarray(_resample_matrix(_normalize_axis(jnp.asarray(c), padding), reso))
              for c in axes]
        p_xz = np.asarray(_resample_plane(planes["xz"], jnp.asarray(ws[2]), jnp.asarray(ws[0])))
        p_xy = np.asarray(_resample_plane(planes["xy"], jnp.asarray(ws[1]), jnp.asarray(ws[0])))
        p_yz = np.asarray(_resample_plane(planes["yz"], jnp.asarray(ws[2]), jnp.asarray(ws[1])))
        w_in = np.asarray(weights["w_in_raw"], np.float64)
        b_in = np.asarray(weights["b_in"], np.float64)[0]
        wz = np.asarray(weights["wz_raw"], np.float64)
        bz = np.asarray(weights["bz_raw"], np.float64)
        alpha = 0.7

        ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij")
        ii, jj, kk = ii.ravel(), jj.ravel(), kk.ravel()
        feat = p_xz[ii, kk] + p_xy[ii, jj] + p_yz[jj, kk]
        x0_tab = q_yz[jj * nz + kk] + q_xz[ii, kk] + q_xy[ii, jj]
        np.testing.assert_allclose(x0_tab, feat @ w_in + b_in, atol=5e-5)

        pts = np.stack([axes[0][ii], axes[1][jj], axes[2][kk]], -1)
        code = np.asarray(positional_encoding(jnp.asarray(pts), 6, 0.5, True), np.float64)
        for b in range(n_blocks):
            tz_tab = z_x[ii, b] + z_y[b, jj] + z_z[b, kk]
            np.testing.assert_allclose(tz_tab, alpha * (code @ wz[b] + bz[b]), atol=5e-5)

    def test_pick_grid_tile(self):
        from gennerf_tpu.ops.pallas.fused_decoder import pick_grid_tile

        assert pick_grid_tile(256, 96) == 32   # flagship val grid: 32*96=3072
        # reference-default grid: tj=32 (4096 pts) is statically legal but
        # Mosaic-rejected on v5e (BENCH.md round 4); the cap keeps it at the
        # proven tile budget -> tj=16, 2048 pts
        assert pick_grid_tile(416, 128) == 16
        assert pick_grid_tile(16, 64) == 16    # tiny test grid: 1024 pts
        # 128-pt tiles violate Mosaic's 1D-output 1024-multiple layout
        # (measured: tj*96 in {768, 1536} fails TPU compile) -> fallback
        assert pick_grid_tile(16, 8) is None
        assert pick_grid_tile(7, 5) is None    # no aligned tile -> fallback


def test_separable_xla_decode_matches_gather_path(rng):
    """The pure-XLA separable grid decode (tier 2 of predict_tsdf_volume)
    matches decode_dense on a grid with NO Mosaic-legal tile — the case the
    Pallas kernel cannot take."""
    from gennerf_tpu.train.predict import (
        decode_dense,
        decode_grid_separable_xla,
        dense_grid_points,
        predict_tsdf_volume,
    )
    from gennerf_tpu.train.tasks import GenNerfTask
    from gennerf_tpu.models.gen_nerf import GenNerf, SceneRepr
    from gennerf_tpu.ops.pallas.fused_decoder import pick_grid_tile

    cfg = {
        "type": "GenNerf", "voxel_size": 0.08,
        "voxel_dim_train": [16, 16, 8], "voxel_dim_val": [16, 16, 8],
        "voxel_dim_test": [16, 16, 8],
        "encoder": {"use_spatial": False, "use_pointnet": True,
                    "pointnet": {"num_sparse_points": 32, "c_dim": 8,
                                 "hidden_dim": 8, "plane_resolution": 16,
                                 "n_blocks": 2, "unet": False}},
        "mlp": {"d_out_sem": 1, "d_out_geo": 8, "n_blocks": 2, "d_hidden": 32},
    }
    task = GenNerfTask(cfg)
    B, T, H, W = 1, 2, 12, 16
    batch = {
        "projection": rng.standard_normal((B, T, 3, 4)).astype(np.float32),
        "image": rng.standard_normal((B, T, 3, H, W)).astype(np.float32),
        "depth": (rng.random((B, T, H, W)) + 0.5).astype(np.float32),
        "vol_08_tsdf": rng.uniform(-1, 1, (B, 1, 16, 16, 8)).astype(np.float32),
    }
    batch["projection"][:, :, 2, 2] = 1.0
    state = task.init_state(jax.random.PRNGKey(0), batch)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    repr_, _ = task.model.apply(
        variables, jnp.asarray(batch["projection"]), jnp.asarray(batch["image"]),
        jnp.asarray(batch["depth"]), jax.random.PRNGKey(0), (16, 16, 8),
        jnp.zeros(3), train=False, method=GenNerf.encode, mutable=["batch_stats"])
    repr_ = SceneRepr(volume=None, valid=repr_.valid,
                      planes={k: 0.02 * v for k, v in repr_.planes.items()})
    voxel_dim = (16, 16, 8)  # 128-pt slabs: no 1024-aligned tile exists
    assert pick_grid_tile(16, 8) is None
    origin = jnp.asarray([0.05, -0.1, 0.02], jnp.float32)
    sep = decode_grid_separable_xla(task.model, variables, repr_, voxel_dim, 0.08, origin)
    pts = dense_grid_points(voxel_dim, 0.08, np.asarray(origin))
    with jax.default_matmul_precision("highest"):
        ref = decode_dense(task.model, variables, repr_, pts, origin).reshape(voxel_dim)
    assert sep.shape == voxel_dim
    # off-TPU the tier auto-selects TRUE-f32 weights/dots (ADVICE round-2:
    # a silently-bf16 default eval path diverged ~1e-2 mean from the f32
    # gather numerics) — agreement is now at f32 reassociation level
    np.testing.assert_allclose(np.asarray(sep), np.asarray(ref), atol=2e-4)
    # the explicit bf16 variant (what the TPU runs) stays within MXU-rounding
    # tolerance of the f32 reference
    from gennerf_tpu.ops.pallas.fused_decoder import separable_grid_decode_xla
    from gennerf_tpu.train.predict import _separable_grid_setup

    planes, weights, common = _separable_grid_setup(task.model, variables, repr_)
    sep_bf16 = separable_grid_decode_xla(
        planes["xz"][0], planes["xy"][0], planes["yz"][0], origin, weights,
        voxel_dim=voxel_dim, voxel_size=0.08, use_bf16=True, **common)
    np.testing.assert_allclose(np.asarray(sep_bf16), np.asarray(ref), atol=8e-2)
    assert np.abs(np.asarray(sep_bf16) - np.asarray(ref)).mean() < 1e-2
    # the dispatcher reaches tier 2 for this grid (off-TPU pallas raises)
    vol = predict_tsdf_volume(task.model, variables, repr_, voxel_dim, 0.08,
                              np.asarray(origin))
    np.testing.assert_allclose(np.asarray(vol), np.asarray(sep), atol=1e-6)


def test_sharded_grid_decode_matches_single(rng):
    """x-axis-sharded grid decode over the 8-device mesh == single-device
    kernel output exactly (interpret mode)."""
    import jax
    from jax.sharding import Mesh

    from gennerf_tpu.models.heads import TSDFHeadSimple
    from gennerf_tpu.models.resnetfc import ResnetFC
    from gennerf_tpu.ops.pallas.fused_decoder import (
        extract_resnetfc_weights,
        fused_grid_decode,
        fused_grid_decode_sharded,
    )

    d_in, d_code, H, n_blocks, reso = 8, 39, 32, 2, 16
    mlp = ResnetFC(d_in=d_in, d_out=9, n_blocks=n_blocks, d_latent=d_code,
                   d_hidden=H, dtype=jnp.bfloat16)
    head = TSDFHeadSimple()
    zx = jnp.asarray(rng.standard_normal((4, d_in + d_code)).astype(np.float32))
    mv = mlp.init(jax.random.PRNGKey(0), zx)
    out = mlp.apply(mv, zx)
    hv = head.init(jax.random.PRNGKey(1), out[:, :8])
    hv = {"params": {"Dense_0": {
        "kernel": 0.1 * jax.random.normal(jax.random.PRNGKey(2),
                                          hv["params"]["Dense_0"]["kernel"].shape),
        "bias": jnp.zeros_like(hv["params"]["Dense_0"]["bias"])}}}
    weights = extract_resnetfc_weights(
        jax.tree.map(np.asarray, mv["params"]),
        jax.tree.map(np.asarray, hv["params"]), n_blocks, 8,
    )
    planes = {k: jnp.asarray(rng.standard_normal((d_in, reso, reso)).astype(np.float32))
              for k in ("xz", "xy", "yz")}
    kw = dict(voxel_dim=(16, 16, 8), voxel_size=0.08, n_blocks=n_blocks,
              num_freqs=6, freq_factor=0.5, include_input=True, padding=0.1,
              tj=16, interpret=True)
    origin = jnp.asarray([0.02, -0.05, 0.01], jnp.float32)
    single = fused_grid_decode(planes["xz"], planes["xy"], planes["yz"],
                               origin, weights, **kw)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sharded = fused_grid_decode_sharded(planes["xz"], planes["xy"], planes["yz"],
                                        origin, weights, mesh, **kw)
    # the unsharded path builds its tables inside jit, the sharded one
    # eagerly — f32 reassociation differences of ~1e-4 are expected
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=1e-3)


def test_predict_sharded_tier_matches_single(rng):
    """decode_grid_fused_sharded (tier 0 of predict_tsdf_volume, reached
    with a multi-device mesh) equals the single-device kernel; the
    dispatcher with a mesh on CPU falls back cleanly."""
    import jax
    from jax.sharding import Mesh

    from gennerf_tpu.train.predict import (
        decode_grid_fused,
        decode_grid_fused_sharded,
        predict_tsdf_volume,
    )
    from gennerf_tpu.train.tasks import GenNerfTask
    from gennerf_tpu.models.gen_nerf import GenNerf, SceneRepr

    cfg = {
        "type": "GenNerf", "voxel_size": 0.08,
        "voxel_dim_train": [16, 16, 8], "voxel_dim_val": [16, 16, 8],
        "voxel_dim_test": [16, 16, 8],
        "encoder": {"use_spatial": False, "use_pointnet": True,
                    "pointnet": {"num_sparse_points": 32, "c_dim": 8,
                                 "hidden_dim": 8, "plane_resolution": 16,
                                 "n_blocks": 2, "unet": False}},
        "mlp": {"d_out_sem": 1, "d_out_geo": 8, "n_blocks": 2, "d_hidden": 32},
    }
    task = GenNerfTask(cfg)
    B, T, H, W = 1, 2, 12, 16
    batch = {
        "projection": rng.standard_normal((B, T, 3, 4)).astype(np.float32),
        "image": rng.standard_normal((B, T, 3, H, W)).astype(np.float32),
        "depth": (rng.random((B, T, H, W)) + 0.5).astype(np.float32),
        "vol_08_tsdf": rng.uniform(-1, 1, (B, 1, 16, 16, 8)).astype(np.float32),
    }
    batch["projection"][:, :, 2, 2] = 1.0
    state = task.init_state(jax.random.PRNGKey(0), batch)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    repr_, _ = task.model.apply(
        variables, jnp.asarray(batch["projection"]), jnp.asarray(batch["image"]),
        jnp.asarray(batch["depth"]), jax.random.PRNGKey(0), (16, 16, 8),
        jnp.zeros(3), train=False, method=GenNerf.encode, mutable=["batch_stats"])
    repr_ = SceneRepr(volume=None, valid=repr_.valid,
                      planes={k: 0.02 * v for k, v in repr_.planes.items()})
    voxel_dim = (16, 16, 64)  # tj=16, nx divisible by 8
    origin = jnp.asarray([0.05, -0.1, 0.02], jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sharded = decode_grid_fused_sharded(
        task.model, variables, repr_, voxel_dim, 0.08, origin, mesh,
        interpret=True)
    single = decode_grid_fused(
        task.model, variables, repr_, voxel_dim, 0.08, origin, interpret=True)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-3)
    # dispatcher: mesh given but platform is CPU -> tier-0 raises inside,
    # falls back without error
    vol = predict_tsdf_volume(task.model, variables, repr_, voxel_dim, 0.08,
                              np.asarray(origin), mesh=mesh)
    assert vol.shape == voxel_dim


class TestPallasFPS:
    def test_indices_identical_to_xla(self, rng):
        """The in-kernel FPS must reproduce the XLA fori_loop indices
        EXACTLY (same start-point key consumption, same first-occurrence
        argmax ties)."""
        from gennerf_tpu.ops.pallas.fps import fps_pallas
        from gennerf_tpu.ops.sampling import farthest_point_sample

        for B, N, npoint in ((8, 256, 32), (8, 384, 17)):
            xyz = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
            key = jax.random.PRNGKey(5)
            _, c_ref = farthest_point_sample(key, xyz, npoint, use_pallas=False)
            s_k, c_k = fps_pallas(key, xyz, npoint, interpret=True)
            np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_k))
            assert s_k.shape == (B, npoint, 3)

    def test_duplicate_points_tie_breaking(self, rng):
        """Duplicated points (the masked-invalid convention) never break
        equality with the XLA path."""
        from gennerf_tpu.ops.pallas.fps import fps_pallas
        from gennerf_tpu.ops.sampling import farthest_point_sample

        B, N, npoint = 8, 128, 16
        base = rng.standard_normal((B, N // 2, 3)).astype(np.float32)
        xyz = jnp.asarray(np.concatenate([base, base], axis=1))
        key = jax.random.PRNGKey(2)
        _, c_ref = farthest_point_sample(key, xyz, npoint, use_pallas=False)
        _, c_k = fps_pallas(key, xyz, npoint, interpret=True)
        np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_k))

    def test_supported_gate(self):
        from gennerf_tpu.ops.pallas.fps import fps_pallas_supported

        assert fps_pallas_supported(8, 4096, 512)  # flagship presample
        assert not fps_pallas_supported(7, 4096, 512)  # sublane misfit
        assert not fps_pallas_supported(8, 100, 512)   # lane misfit
        assert not fps_pallas_supported(8, 4096, 100)  # npoint misfit
        assert not fps_pallas_supported(8, 1 << 20, 512)  # VMEM blowout
        # B*N bound is STRICT: B*N == 1<<19 (batch B=4: 32 frames x 16384
        # presample) crashes the remote Mosaic toolchain — root-caused
        # round 5; B*N = 3<<17 (BT=24) measured working
        assert fps_pallas_supported(24, 16384, 512)
        assert not fps_pallas_supported(32, 16384, 512)


def test_point_tsdf_fn_matches_decode_and_renders(rng):
    """make_point_tsdf_fn (fused arbitrary-point tier, VERDICT round-2
    missing #4): matches GenNerf.decode at bf16 tolerance on random points,
    and drives the SurfaceRenderer to the same depths as the plain path."""
    from gennerf_tpu.models.gen_nerf import GenNerf, SceneRepr
    from gennerf_tpu.models.renderer import SurfaceRenderer
    from gennerf_tpu.train.predict import make_point_tsdf_fn
    from gennerf_tpu.train.tasks import GenNerfTask

    cfg = {
        "type": "GenNerf", "voxel_size": 0.08,
        "voxel_dim_train": [16, 16, 8], "voxel_dim_val": [16, 16, 8],
        "voxel_dim_test": [16, 16, 8],
        "encoder": {"use_spatial": False, "use_pointnet": True,
                    "pointnet": {"num_sparse_points": 32, "c_dim": 8,
                                 "hidden_dim": 8, "plane_resolution": 16,
                                 "n_blocks": 2, "unet": False}},
        "mlp": {"d_out_sem": 1, "d_out_geo": 8, "n_blocks": 2, "d_hidden": 32},
    }
    task = GenNerfTask(cfg)
    B, T, H, W = 1, 2, 12, 16
    batch = {
        "projection": rng.standard_normal((B, T, 3, 4)).astype(np.float32),
        "image": rng.standard_normal((B, T, 3, H, W)).astype(np.float32),
        "depth": (rng.random((B, T, H, W)) + 0.5).astype(np.float32),
        "vol_08_tsdf": rng.uniform(-1, 1, (B, 1, 16, 16, 8)).astype(np.float32),
    }
    batch["projection"][:, :, 2, 2] = 1.0
    state = task.init_state(jax.random.PRNGKey(0), batch)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    repr_, _ = task.model.apply(
        variables, jnp.asarray(batch["projection"]), jnp.asarray(batch["image"]),
        jnp.asarray(batch["depth"]), jax.random.PRNGKey(0), (16, 16, 8),
        jnp.zeros(3), train=False, method=GenNerf.encode, mutable=["batch_stats"])
    repr_ = SceneRepr(volume=None, valid=repr_.valid,
                      planes={k: 0.02 * v for k, v in repr_.planes.items()})

    origin = jnp.zeros(3)
    tsdf_fn = make_point_tsdf_fn(task.model, variables, repr_, origin,
                                 tile=128, interpret=True)
    pts = jnp.asarray(rng.uniform(-0.3, 0.9, (1, 300, 3)).astype(np.float32))
    fused = tsdf_fn(pts)
    ref = task.model.apply(variables, repr_, pts, origin,
                           method=GenNerf.decode)["tsdf"][..., 0]
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=5e-2)
    c = np.corrcoef(np.asarray(fused).ravel(), np.asarray(ref).ravel())[0, 1]
    assert c > 0.999

    # renderer: fused-march depths match the plain-march depths
    def decode_fn(p):
        return task.model.apply(variables, repr_, p, origin, method=GenNerf.decode)

    K = jnp.asarray(np.array([[[20.0, 0, 8], [0, 20.0, 6], [0, 0, 1]]], np.float32))
    pose = jnp.asarray(np.eye(4, dtype=np.float32)[None]).at[0, 2, 3].set(-1.0)
    plain = SurfaceRenderer(decode_fn, near=0.1, far=3.0, n_steps=24)
    fused_r = SurfaceRenderer(decode_fn, near=0.1, far=3.0, n_steps=24,
                              tsdf_fn=tsdf_fn)
    d_plain = plain.render_depth_image(K, pose, 12, 16)
    d_fused = fused_r.render_depth_image(K, pose, 12, 16)
    # bf16 field rounding can move a marginal crossing by a step; compare
    # where both agree a surface exists
    both = (np.asarray(d_plain) > 0) & (np.asarray(d_fused) > 0)
    agree = both.mean() if both.size else 1.0
    np.testing.assert_allclose(np.asarray(d_fused)[both],
                               np.asarray(d_plain)[both], atol=0.15)
