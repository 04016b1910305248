"""Model component tests: shape contracts, init/math parity spot-checks
(torch used only as an oracle), and end-to-end GenNerf/VoxelNet smoke tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from gennerf_tpu.models import (
    GenNerf,
    GenNerfConfig,
    VoxelNet,
    VoxelNetConfig,
    LocalPoolPointnet,
    ResnetFC,
    SpatialEncoder,
    TSDFHeadSimple,
    UNet,
    EncoderDecoder,
    positional_encoding,
    positional_encoding_dim,
    spatial_latent_size,
)
from gennerf_tpu.models.config import (
    Backbone3dConfig,
    EncoderConfig,
    MlpConfig,
    PointnetConfig,
    SpatialEncoderConfig,
    config_from_dict,
)


class TestPositionalEncoding:
    def test_parity_with_reference_torch(self, rng):
        """Oracle: the reference module math (positional_encoding.py:28-41)."""
        num_freqs, freq_factor, d_in = 2, 0.5, 3
        x = rng.standard_normal((50, d_in)).astype(np.float32)

        ours = np.asarray(positional_encoding(jnp.asarray(x), num_freqs, freq_factor, True))

        tx = torch.from_numpy(x)
        freqs = freq_factor * 2.0 ** torch.arange(0, num_freqs)
        _freqs = torch.repeat_interleave(freqs, 2).view(1, -1, 1)
        _phases = torch.zeros(2 * num_freqs)
        _phases[1::2] = np.pi * 0.5
        _phases = _phases.view(1, -1, 1)
        embed = tx.unsqueeze(1).repeat(1, num_freqs * 2, 1)
        embed = torch.sin(torch.addcmul(_phases, embed, _freqs))
        ref = torch.cat((tx, embed.view(x.shape[0], -1)), dim=-1).numpy()

        assert ours.shape[-1] == positional_encoding_dim(num_freqs, d_in, True)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


class TestResnetFC:
    def test_shapes_and_zero_block_init(self, rng):
        d_latent, d_in = 21, 32
        m = ResnetFC(d_in=d_in, d_out=64, n_blocks=3, d_latent=d_latent, d_hidden=128)
        zx = jnp.asarray(rng.standard_normal((4, 10, d_latent + d_in)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), zx)
        out = m.apply(params, zx)
        assert out.shape == (4, 10, 64)
        # zero-init residual second layers
        assert np.all(np.asarray(params["params"]["block_0"]["Dense_1"]["kernel"]) == 0)

    def test_spade_and_layernorm_paths(self, rng):
        m = ResnetFC(d_in=8, d_out=4, n_blocks=2, d_latent=6, d_hidden=16,
                     use_spade=True, use_layer_norm=True, beta=100.0)
        zx = jnp.asarray(rng.standard_normal((2, 5, 14)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), zx)
        out = m.apply(params, zx)
        assert np.isfinite(np.asarray(out)).all()


class TestPointnet:
    def test_triplane_shapes(self, rng):
        m = LocalPoolPointnet(c_dim=16, hidden_dim=16, plane_resolution=32,
                              use_unet=True, unet_depth=3, unet_start_filts=16,
                              n_blocks=3)
        p = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 64, 3)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), p)
        planes = m.apply(params, p)
        assert set(planes.keys()) == {"xz", "xy", "yz"}
        for v in planes.values():
            assert v.shape == (2, 16, 32, 32)

    def test_pool_local_is_cellwise(self, rng):
        """Points in the same cell must receive identical pooled features
        after block 1's pooling (structural property of pool_local)."""
        m = LocalPoolPointnet(c_dim=8, hidden_dim=8, plane_resolution=4,
                              use_unet=False, n_blocks=2, plane_type=("xz",))
        # two points in the same xz cell, one far away
        p = jnp.asarray(np.array([[[0.01, 0.3, 0.01], [0.012, -0.4, 0.012], [0.4, 0.0, 0.4]]], np.float32))
        params = m.init(jax.random.PRNGKey(0), p)
        planes = m.apply(params, p)
        assert planes["xz"].shape == (1, 8, 4, 4)


class TestSpatialEncoder:
    @pytest.mark.parametrize("backbone,num_layers,expected", [
        ("resnet34", 4, 512), ("resnet34", 2, 128), ("resnet50", 4, 1856),
    ])
    def test_latent_size_table(self, backbone, num_layers, expected):
        assert spatial_latent_size(backbone, num_layers) == expected

    def test_forward_shape(self, rng):
        m = SpatialEncoder(backbone="resnet18", num_layers=2, feature_scale=1.0,
                           blur_image=False)
        x = jnp.asarray(rng.standard_normal((1, 3, 32, 48)).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), x)
        out, _ = m.apply(variables, x, train=False, mutable=["batch_stats"])
        assert out.shape == (1, 128, 16, 24)  # stem halves resolution

    def test_feature_scale_2_restores_resolution(self, rng):
        """The flagship config uses feature_scale=2.0 so the latent returns
        to input resolution (pixel-aligned with raw projections)."""
        m = SpatialEncoder(backbone="resnet18", num_layers=2, feature_scale=2.0,
                           blur_image=False)
        x = jnp.asarray(rng.standard_normal((1, 3, 16, 24)).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), x)
        out, _ = m.apply(variables, x, train=False, mutable=["batch_stats"])
        assert out.shape == (1, 128, 16, 24)


class TestHeadsAndBackbone3d:
    def test_tsdf_head_simple_range(self, rng):
        m = TSDFHeadSimple()
        x = jnp.asarray(rng.standard_normal((2, 7, 32)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == (2, 7, 1)
        assert (np.abs(np.asarray(out)) <= 1).all()

    def test_encoder_decoder_multiscale(self, rng):
        m = EncoderDecoder(channels=(8, 16, 32), layers_down=(1, 1, 1),
                           layers_up=(1, 1), norm="GN", cond_proj=True)
        x = jnp.asarray(rng.standard_normal((1, 8, 16, 16, 8)).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), x, train=False)
        outs = m.apply(variables, x, train=False)
        assert [tuple(o.shape) for o in outs] == [
            (1, 16, 8, 8, 4), (1, 8, 16, 16, 8)]


@pytest.fixture(scope="module")
def tiny_gen_nerf_cfg():
    return GenNerfConfig(
        voxel_size=0.08,
        voxel_dim_train=(16, 16, 8),
        voxel_dim_val=(16, 16, 8),
        voxel_dim_test=(16, 16, 8),
        encoder=EncoderConfig(
            use_spatial=True,
            spatial=SpatialEncoderConfig(backbone="resnet18", num_layers=2,
                                         feature_scale=1.0, blur_image=False),
            use_pointnet=True,
            pointnet=PointnetConfig(num_sparse_points=32, c_dim=8, hidden_dim=8,
                                    plane_resolution=16, n_blocks=2, unet=False),
        ),
        mlp=MlpConfig(d_out_sem=4, d_out_geo=4, n_blocks=2, d_hidden=32),
    )


class TestGenNerfEndToEnd:
    def test_encode_decode_shapes(self, tiny_gen_nerf_cfg, rng):
        cfg = tiny_gen_nerf_cfg
        model = GenNerf(cfg)
        B, T, H, W = 1, 2, 16, 20
        proj = jnp.asarray(rng.standard_normal((B, T, 3, 4)).astype(np.float32))
        proj = proj.at[:, :, 2, 2].set(1.0)
        image = jnp.asarray(rng.standard_normal((B, T, 3, H, W)).astype(np.float32))
        depth = jnp.asarray(rng.random((B, T, H, W)).astype(np.float32) + 0.5)
        xyz = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 17, 3)).astype(np.float32))
        origin = jnp.zeros(3)
        key = jax.random.PRNGKey(0)

        variables = model.init(
            jax.random.PRNGKey(1), proj, image, depth, xyz, key,
            cfg.voxel_dim_train, origin, train=False,
        )
        out, _ = model.apply(
            variables, proj, image, depth, xyz, key, cfg.voxel_dim_train, origin,
            train=False, mutable=["batch_stats"],
        )
        assert out["tsdf"].shape == (B, 17, 1)
        assert out["feat_geo"].shape == (B, 17, 4)
        assert out["feat_sem"].shape == (B, 17, 4)
        assert out["feat"].shape == (B, 17, cfg.encoder_latent)
        assert np.isfinite(np.asarray(out["tsdf"])).all()

    def test_decode_grad(self, tiny_gen_nerf_cfg, rng):
        """Eikonal path: d tsdf / d xyz must exist and be finite."""
        cfg = tiny_gen_nerf_cfg
        model = GenNerf(cfg)
        B, T, H, W = 1, 1, 16, 20
        proj = jnp.asarray(rng.standard_normal((B, T, 3, 4)).astype(np.float32))
        image = jnp.asarray(rng.standard_normal((B, T, 3, H, W)).astype(np.float32))
        depth = jnp.asarray(rng.random((B, T, H, W)).astype(np.float32) + 0.5)
        xyz = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 5, 3)).astype(np.float32))
        origin = jnp.zeros(3)
        key = jax.random.PRNGKey(0)
        variables = model.init(
            jax.random.PRNGKey(1), proj, image, depth, xyz, key,
            cfg.voxel_dim_train, origin, train=False,
        )

        def apply_grad(v):
            return model.apply(
                v, method=lambda m: None
            )

        repr_, _ = model.apply(
            variables, proj, image, depth, key, cfg.voxel_dim_train, origin,
            train=False, method=GenNerf.encode, mutable=["batch_stats"],
        )
        out = model.apply(
            variables, repr_, xyz, origin, method=GenNerf.decode_with_grad,
        )
        assert out["grad"].shape == (B, 5, 3)
        assert np.isfinite(np.asarray(out["grad"])).all()


class TestVoxelNetEndToEnd:
    def test_forward_multiscale_outputs_and_losses(self, rng):
        cfg = VoxelNetConfig(
            voxel_size=0.08,
            voxel_dim_train=(16, 16, 16),
            encoder=EncoderConfig(
                use_pointnet=False,
                spatial=SpatialEncoderConfig(backbone="resnet18", num_layers=2,
                                             feature_scale=1.0, blur_image=False),
            ),
            backbone3d=Backbone3dConfig(channels=(8, 16, 32), layers_down=(1, 1, 1),
                                        layers=(1, 1), norm="GN"),
        )
        model = VoxelNet(cfg)
        B, T, H, W = 1, 2, 16, 20
        proj = jnp.asarray(rng.standard_normal((B, T, 3, 4)).astype(np.float32))
        image = jnp.asarray(rng.standard_normal((B, T, 3, H, W)).astype(np.float32))
        depth = jnp.asarray(rng.random((B, T, H, W)).astype(np.float32) + 0.5)
        origin = jnp.zeros(3)
        # multi-scale targets: voxel sizes [8, 16] -> dims 16^3 and 8^3
        targets = {
            "vol_08_tsdf": jnp.asarray(rng.uniform(-1, 1, (B, 1, 16, 16, 16)).astype(np.float32)),
            "vol_16_tsdf": jnp.asarray(rng.uniform(-1, 1, (B, 1, 8, 8, 8)).astype(np.float32)),
        }
        variables = model.init(
            jax.random.PRNGKey(0), proj, image, depth, cfg.voxel_dim_train,
            origin, targets, train=False,
        )
        (outputs, losses), _ = model.apply(
            variables, proj, image, depth, cfg.voxel_dim_train, origin, targets,
            train=False, mutable=["batch_stats"],
        )
        assert outputs["vol_08_tsdf"].shape == (B, 1, 16, 16, 16)
        assert outputs["vol_16_tsdf"].shape == (B, 1, 8, 8, 8)
        assert "vol_08_tsdf_loss" in losses and "vol_16_tsdf_loss" in losses
        for v in losses.values():
            assert np.isfinite(float(v))


class TestConfigFromDict:
    def test_reference_yaml_shape(self):
        d = {
            "voxel_size": 0.04,
            "encoder": {
                "use_spatial": False,
                "use_pointnet": True,
                "pointnet": {
                    "num_sparse_points": 512, "c_dim": 64, "hidden_dim": 32,
                    "plane_resolution": 128, "n_blocks": 5, "unet": True,
                    "unet_kwargs": {"depth": 5, "merge_mode": "concat", "start_filts": 32},
                },
            },
            "mlp": {"d_out_geo": 16, "d_out_sem": 16, "d_hidden": 256},
            "unknown_key": 123,
        }
        cfg = config_from_dict(GenNerfConfig, d)
        assert cfg.encoder.pointnet.c_dim == 64
        assert cfg.encoder.pointnet.unet_depth == 5
        assert cfg.encoder.pointnet.unet_start_filts == 32
        assert cfg.mlp.d_hidden == 256
        assert not cfg.encoder.use_spatial
        assert cfg.encoder_latent == 64
