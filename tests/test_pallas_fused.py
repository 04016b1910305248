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
