"""Full-model torch<->flax parity harness (VERDICT round-1 item #3).

A torch re-implementation of the reference GenNerf math (pointnet flagship
path: LocalPoolPointnet + 2D UNet -> triplane sample -> PE -> ResnetFC ->
TSDFHeadSimple; reference src/models/model.py:207-248, losses :331-470) acts
as the oracle. Weights random-initialized in torch are ported into the flax
model via utils/port_gen_nerf.py (reference checkpoint key names), and the
encode/decode outputs plus every loss term must agree within float32
tolerance; the reverse export must round-trip exactly. This is the substance
behind the "TSDF L1 within 1%" parity claim: if any layer's semantics drift,
this fails.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from gennerf_tpu.models.config import GenNerfConfig, config_from_dict
from gennerf_tpu.models.gen_nerf import GenNerf, SceneRepr
from gennerf_tpu.utils.port_gen_nerf import (
    export_gen_nerf_params,
    merge_params,
    port_gen_nerf_params,
)

# ---------------------------------------------------------------------------
# torch oracle (reference math; reference module/attr names so state_dict
# keys match a real Lightning checkpoint)
# ---------------------------------------------------------------------------

PAD = 0.1


def t_normalize_coordinate(p, plane):
    axes = {"xz": (0, 2), "xy": (0, 1), "yz": (1, 2)}[plane]
    xy = p[..., list(axes)]
    xy = xy / (1 + PAD + 10e-6) + 0.5
    return xy.clamp(0.0, 1.0 - 10e-6)


def t_coordinate2index(x, reso):
    xi = (x * reso).long()
    return (xi[..., 0] + reso * xi[..., 1])[:, None]  # (B, 1, N)


def t_scatter_mean(src, index, num_cells):
    """src (B, C, N), index (B, 1, N) -> (B, C, num_cells); empty cells 0."""
    B, C, N = src.shape
    idx = index.expand(-1, C, -1)
    total = torch.zeros(B, C, num_cells, dtype=src.dtype).scatter_add_(2, idx, src)
    count = torch.zeros(B, C, num_cells, dtype=src.dtype).scatter_add_(
        2, idx, torch.ones_like(src))
    return total / count.clamp(min=1.0)


def t_scatter_max(src, index, num_cells):
    B, C, N = src.shape
    idx = index.expand(-1, C, -1)
    out = torch.zeros(B, C, num_cells, dtype=src.dtype)
    return out.scatter_reduce(2, idx, src, reduce="amax", include_self=False)


class TBlockFC(tnn.Module):
    def __init__(self, size_in, size_out=None, size_h=None):
        super().__init__()
        size_out = size_out or size_in
        size_h = size_h or min(size_in, size_out)
        self.fc_0 = tnn.Linear(size_in, size_h)
        self.fc_1 = tnn.Linear(size_h, size_out)
        self.shortcut = (
            None if size_in == size_out else tnn.Linear(size_in, size_out, bias=False)
        )

    def forward(self, x):
        net = self.fc_0(F.relu(x))
        dx = self.fc_1(F.relu(net))
        xs = x if self.shortcut is None else self.shortcut(x)
        return xs + dx


class TDownConv(tnn.Module):
    def __init__(self, ins, outs, pooling):
        super().__init__()
        self.conv1 = tnn.Conv2d(ins, outs, 3, padding=1)
        self.conv2 = tnn.Conv2d(outs, outs, 3, padding=1)
        self.pooling = pooling

    def forward(self, x):
        x = F.relu(self.conv1(x))
        x = F.relu(self.conv2(x))
        before = x
        if self.pooling:
            x = F.max_pool2d(x, 2, 2)
        return x, before


class TUpConv(tnn.Module):
    def __init__(self, ins, outs):
        super().__init__()
        self.upconv = tnn.ConvTranspose2d(ins, outs, 2, stride=2)
        self.conv1 = tnn.Conv2d(2 * outs, outs, 3, padding=1)
        self.conv2 = tnn.Conv2d(outs, outs, 3, padding=1)

    def forward(self, from_down, from_up):
        up = self.upconv(from_up)
        x = torch.cat((up, from_down), 1)
        x = F.relu(self.conv1(x))
        return F.relu(self.conv2(x))


class TUNet(tnn.Module):
    def __init__(self, num_classes, in_channels, depth, start_filts):
        super().__init__()
        downs, ins = [], in_channels
        for i in range(depth):
            outs = start_filts * (2**i)
            downs.append(TDownConv(ins, outs, pooling=i < depth - 1))
            ins = outs
        self.down_convs = tnn.ModuleList(downs)
        ups = []
        for i in range(depth - 1):
            outs = ins // 2
            ups.append(TUpConv(ins, outs))
            ins = outs
        self.up_convs = tnn.ModuleList(ups)
        self.conv_final = tnn.Conv2d(ins, num_classes, 1)

    def forward(self, x):
        encoder_outs = []
        for d in self.down_convs:
            x, before = d(x)
            encoder_outs.append(before)
        for i, u in enumerate(self.up_convs):
            x = u(encoder_outs[-(i + 2)], x)
        return self.conv_final(x)


class TLocalPoolPointnet(tnn.Module):
    def __init__(self, c_dim, hidden, n_blocks, reso, unet_depth, unet_filts):
        super().__init__()
        self.reso = reso
        self.fc_pos = tnn.Linear(3, 2 * hidden)
        self.blocks = tnn.ModuleList(
            [TBlockFC(2 * hidden, hidden) for _ in range(n_blocks)]
        )
        self.fc_c = tnn.Linear(hidden, c_dim)
        self.c_dim = c_dim
        self.unet = TUNet(c_dim, c_dim, unet_depth, unet_filts)

    def pool_local(self, index, c):
        c_out = 0
        for key in index:
            fea = t_scatter_max(c.permute(0, 2, 1), index[key], self.reso**2)
            fea = fea.gather(dim=2, index=index[key].expand(-1, c.size(2), -1))
            c_out = c_out + fea
        return c_out.permute(0, 2, 1)

    def forward(self, p):
        index = {
            pl: t_coordinate2index(t_normalize_coordinate(p, pl), self.reso)
            for pl in ("xz", "xy", "yz")
        }
        net = self.fc_pos(p)
        net = self.blocks[0](net)
        for block in self.blocks[1:]:
            pooled = self.pool_local(index, net)
            net = torch.cat([net, pooled], dim=2)
            net = block(net)
        c = self.fc_c(net)
        fea = {}
        for pl in ("xz", "xy", "yz"):
            plane = t_scatter_mean(c.permute(0, 2, 1), index[pl], self.reso**2)
            plane = plane.reshape(p.size(0), self.c_dim, self.reso, self.reso)
            fea[pl] = self.unet(plane)
        return fea


class TResnetFC(tnn.Module):
    def __init__(self, d_in, d_out, n_blocks, d_latent, d_hidden, alpha=1.0):
        super().__init__()
        self.d_latent = d_latent
        self.alpha = alpha
        self.lin_in = tnn.Linear(d_in, d_hidden)
        self.lin_out = tnn.Linear(d_hidden, d_out)
        self.blocks = tnn.ModuleList([TBlockFC(d_hidden) for _ in range(n_blocks)])
        self.lin_z = tnn.ModuleList(
            [tnn.Linear(d_latent, d_hidden) for _ in range(n_blocks)]
        )

    def forward(self, zx):
        z, x = zx[..., : self.d_latent], zx[..., self.d_latent:]
        x = self.lin_in(x)
        for block, lz in zip(self.blocks, self.lin_z):
            x = x + self.alpha * lz(z)
            x = block(x)
        return self.lin_out(F.relu(x))


class THead(tnn.Module):
    def __init__(self, d):
        super().__init__()
        self.fc = tnn.Linear(d, 1)

    def forward(self, x):
        return torch.tanh(self.fc(x))


class TorchGenNerf(tnn.Module):
    """Reference-math GenNerf (pointnet path), reference attr names."""

    def __init__(self, c_dim, hidden, pn_blocks, reso, unet_depth, unet_filts,
                 d_hidden, mlp_blocks, d_geo, d_sem, num_freqs, freq_factor):
        super().__init__()
        self.pointnet = TLocalPoolPointnet(c_dim, hidden, pn_blocks, reso,
                                           unet_depth, unet_filts)
        d_code = num_freqs * 2 * 3 + 3
        self.mlp = TResnetFC(c_dim, d_geo + d_sem, mlp_blocks, d_code, d_hidden)
        self.head_geo = THead(d_geo)
        self.d_geo = d_geo
        freqs = freq_factor * 2.0 ** torch.arange(num_freqs)
        self._freqs = torch.repeat_interleave(freqs, 2).view(1, -1, 1)
        phases = torch.zeros(2 * num_freqs)
        phases[1::2] = np.pi * 0.5
        self._phases = phases.view(1, -1, 1)

    def sample_planes(self, planes, xyz):
        feat = 0
        for pl in ("xz", "xy", "yz"):
            uv = t_normalize_coordinate(xyz, pl)
            vgrid = (2.0 * uv - 1.0)[:, :, None]  # (B, N, 1, 2)
            s = F.grid_sample(planes[pl], vgrid, padding_mode="border",
                              align_corners=True)  # (B, C, N, 1)
            feat = feat + s[..., 0].permute(0, 2, 1)
        return feat

    def decode(self, planes, xyz):
        feat = self.sample_planes(planes, xyz)
        B, N, _ = xyz.shape
        x = xyz.reshape(-1, 3)
        embed = x.unsqueeze(1).repeat(1, self._freqs.shape[1], 1)
        embed = torch.sin(torch.addcmul(self._phases, embed, self._freqs))
        code = torch.cat((x, embed.view(x.shape[0], -1)), -1).reshape(B, N, -1)
        out = self.mlp(torch.cat((code, feat), -1))
        feat_geo = out[..., : self.d_geo]
        return {
            "feat_geo": feat_geo,
            "feat_sem": out[..., self.d_geo:],
            "tsdf": self.head_geo(feat_geo),
        }


def t_smooth_log(x, shift=1.0, beta=1.0):
    return torch.tanh(x) * F.softplus(x.abs() / shift, beta=beta)


def torch_losses(pred, trgt, free_space_factor=5.0, trunc_weight=10.0):
    """Reference loss_tsdf (smooth_log) + loss_isdf (model.py:331-384)."""
    lt = (t_smooth_log(pred) - t_smooth_log(trgt)).abs()
    term1 = torch.exp(-free_space_factor * pred) - 1.0
    term2 = pred - trgt
    loss_free = torch.max(F.relu(term1), term2)
    loss_near = (pred - trgt).abs() * trunc_weight
    mask = (trgt <= 1.0).float()
    li = mask * loss_near + (1 - mask) * loss_free
    return lt, li


# ---------------------------------------------------------------------------
# the parity tests
# ---------------------------------------------------------------------------

C_DIM, HIDDEN, PN_BLOCKS, RESO = 16, 16, 3, 32
UNET_DEPTH, UNET_FILTS = 2, 8
D_HIDDEN, MLP_BLOCKS, D_GEO, D_SEM = 32, 3, 16, 1
NUM_FREQS, FREQ_FACTOR = 6, 0.5


@pytest.fixture(scope="module")
def oracle_and_flax():
    torch.manual_seed(3)
    oracle = TorchGenNerf(C_DIM, HIDDEN, PN_BLOCKS, RESO, UNET_DEPTH, UNET_FILTS,
                          D_HIDDEN, MLP_BLOCKS, D_GEO, D_SEM, NUM_FREQS, FREQ_FACTOR)
    # randomize everything (zero-init'd layers would make blocks trivial)
    with torch.no_grad():
        for p in oracle.parameters():
            p.normal_(0.0, 0.25)
    oracle.eval()

    cfg = config_from_dict(GenNerfConfig, {
        "voxel_size": 0.08,
        "voxel_dim_train": [16, 16, 8], "voxel_dim_val": [16, 16, 8],
        "voxel_dim_test": [16, 16, 8],
        "encoder": {"use_spatial": False, "use_pointnet": True,
                    "pointnet": {"num_sparse_points": 64, "c_dim": C_DIM,
                                 "hidden_dim": HIDDEN, "plane_resolution": RESO,
                                 "n_blocks": PN_BLOCKS, "unet": True,
                                 "unet_depth": UNET_DEPTH,
                                 "unet_start_filts": UNET_FILTS,
                                 "scatter_type": "max"}},
        "mlp": {"d_out_sem": D_SEM, "d_out_geo": D_GEO, "n_blocks": MLP_BLOCKS,
                "d_hidden": D_HIDDEN},
        "code": {"num_freqs": NUM_FREQS, "freq_factor": FREQ_FACTOR},
    })
    model = GenNerf(cfg)

    # init a full param tree, then graft the ported torch weights in
    rng = np.random.default_rng(0)
    B, T, H, W = 1, 1, 8, 8
    proj = jnp.asarray(rng.standard_normal((B, T, 3, 4)).astype(np.float32))
    proj = proj.at[:, :, 2, 2].set(1.0)
    image = jnp.asarray(rng.standard_normal((B, T, 3, H, W)).astype(np.float32))
    depth = jnp.asarray((rng.random((B, T, H, W)) + 0.5).astype(np.float32))
    xyz0 = jnp.zeros((B, 8, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), proj, image, depth, xyz0,
                           jax.random.PRNGKey(1), (16, 16, 8), jnp.zeros(3),
                           train=False)

    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    ported = port_gen_nerf_params(sd, cfg)
    params = merge_params(variables["params"], ported)
    variables = {"params": params, "batch_stats": variables.get("batch_stats", {})}
    return oracle, model, cfg, variables, sd


def test_pointnet_encode_parity(oracle_and_flax, rng):
    oracle, model, cfg, variables, _ = oracle_and_flax
    cloud = rng.uniform(-0.5, 0.5, (2, 64, 3)).astype(np.float32)
    with torch.no_grad():
        planes_t = oracle.pointnet(torch.from_numpy(cloud))
    planes_j = model.apply(variables, jnp.asarray(cloud),
                           method=lambda m, p: m.pointnet(p))
    for pl in ("xz", "xy", "yz"):
        np.testing.assert_allclose(
            np.asarray(planes_j[pl]), planes_t[pl].numpy(), atol=2e-4,
            err_msg=f"plane {pl} diverged",
        )


def test_decode_and_loss_parity(oracle_and_flax, rng):
    oracle, model, cfg, variables, _ = oracle_and_flax
    cloud = rng.uniform(-0.5, 0.5, (1, 64, 3)).astype(np.float32)
    xyz = rng.uniform(-0.5, 0.5, (1, 128, 3)).astype(np.float32)

    with torch.no_grad():
        planes_t = oracle.pointnet(torch.from_numpy(cloud))
        out_t = oracle.decode(planes_t, torch.from_numpy(xyz))

    planes_j = model.apply(variables, jnp.asarray(cloud),
                           method=lambda m, p: m.pointnet(p))
    repr_ = SceneRepr(volume=None, valid=None, planes=planes_j)
    out_j = model.apply(variables, repr_, jnp.asarray(xyz), jnp.zeros(3),
                        method=GenNerf.decode)

    np.testing.assert_allclose(np.asarray(out_j["feat_geo"]),
                               out_t["feat_geo"].numpy(), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_j["feat_sem"]),
                               out_t["feat_sem"].numpy(), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_j["tsdf"]),
                               out_t["tsdf"].numpy(), rtol=1e-5, atol=1e-3)

    # per-term losses on the same fixed outputs/targets
    trgt = rng.uniform(-1, 1, (1, 128, 1)).astype(np.float32)
    lt_t, li_t = torch_losses(out_t["tsdf"], torch.from_numpy(trgt))
    from gennerf_tpu.models.losses import loss_isdf, loss_tsdf

    lcfg = config_from_dict(GenNerfConfig, {"loss": {
        "use_tsdf": True, "use_isdf": True,
        "tsdf": {"transform": "smooth_log", "shift": 1.0, "smoothness": 1.0},
        "isdf": {"free_space_factor": 5.0, "trunc_weight": 10.0},
    }}).loss
    lt_j = loss_tsdf(lcfg, {"tsdf": out_j["tsdf"]}, {"tsdf": jnp.asarray(trgt)})
    li_j = loss_isdf(lcfg, {"tsdf": out_j["tsdf"]}, {"tsdf": jnp.asarray(trgt)})
    np.testing.assert_allclose(np.asarray(lt_j), lt_t.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(li_j), li_t.numpy(), atol=1e-3)


def test_export_round_trip(oracle_and_flax):
    """flax -> torch export reproduces the original state dict exactly."""
    oracle, model, cfg, variables, sd = oracle_and_flax
    exported = export_gen_nerf_params(variables["params"], cfg)
    missing = set(sd) - set(exported)
    assert not missing, f"export missing keys: {sorted(missing)[:5]}"
    for k in sd:
        np.testing.assert_array_almost_equal(
            exported[k], sd[k], decimal=6, err_msg=f"round-trip drift at {k}"
        )


# ---------------------------------------------------------------------------
# VoxelNet: backbone3d EncoderDecoder + VoxelHeads parity
# ---------------------------------------------------------------------------


class TBasicBlock3d(tnn.Module):
    """Reference BasicBlock3d (backbone3d.py:56-95), eval-mode BN."""

    def __init__(self, planes):
        super().__init__()
        self.conv1 = tnn.Conv3d(planes, planes, 3, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm3d(planes)
        self.conv2 = tnn.Conv3d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm3d(planes)

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + x)


class TCondProj(tnn.Module):
    def __init__(self, n):
        super().__init__()
        self.conv = tnn.Conv3d(n, n, 1, bias=False)
        self.norm = tnn.BatchNorm3d(n)

    def forward(self, x, y, mask):
        x = self.conv(x)
        m = mask.expand(-1, x.size(1), -1, -1, -1)
        x = torch.where(m, x, y)
        return F.relu(self.norm(x))


class TEncoderDecoder(tnn.Module):
    """Reference EncoderDecoder (backbone3d.py:134-208), reference attr
    names for state_dict parity."""

    def __init__(self, channels, layers_down, layers_up):
        super().__init__()
        downs = [tnn.Sequential(*[TBasicBlock3d(channels[0])
                                  for _ in range(layers_down[0])])]
        projs = [TCondProj(channels[0])]
        for i in range(1, len(channels)):
            layer = [tnn.Conv3d(channels[i - 1], channels[i], 3, 2, 1, bias=False),
                     tnn.BatchNorm3d(channels[i]), tnn.Dropout(0.0), tnn.ReLU()]
            layer += [TBasicBlock3d(channels[i]) for _ in range(layers_down[i])]
            downs.append(tnn.Sequential(*layer))
            if i < len(channels) - 1:
                projs.append(TCondProj(channels[i]))
        self.layers_down = tnn.ModuleList(downs)
        self.proj = tnn.ModuleList(projs[::-1])
        rev = channels[::-1]
        self.layers_up_conv = tnn.ModuleList(
            [tnn.Conv3d(rev[i - 1], rev[i], 1, bias=False) for i in range(1, len(rev))]
        )
        self.layers_up_res = tnn.ModuleList([
            tnn.Sequential(*[TBasicBlock3d(rev[i]) for _ in range(layers_up[i - 1])])
            for i in range(1, len(rev))
        ])

    def forward(self, x):
        valid_mask = (x != 0).any(1, keepdim=True).float()
        xs = []
        for layer in self.layers_down:
            x = layer(x)
            xs.append(x)
        xs = xs[::-1]
        out = []
        for i in range(len(self.layers_up_conv)):
            x = F.interpolate(x, scale_factor=2, mode="trilinear", align_corners=False)
            x = self.layers_up_conv[i](x)
            scale = 1 / 2 ** (len(self.layers_up_conv) - i - 1)
            mask = F.interpolate(valid_mask, scale_factor=scale) != 0
            y = self.proj[i](xs[i + 1], x, mask)
            x = (x + y) / 2
            x = self.layers_up_res[i](x)
            out.append(x)
        return out


class TVoxelNetHead(tnn.Module):
    """Container matching reference heads3d.py names (heads.0.decoders.i)."""

    class _TSDF(tnn.Module):
        def __init__(self, channels):
            super().__init__()
            self.decoders = tnn.ModuleList(
                [tnn.Conv3d(c, 1, 1, bias=False) for c in channels[:-1]][::-1]
            )

    def __init__(self, channels):
        super().__init__()
        self.heads = tnn.ModuleList([self._TSDF(channels)])


def t_log_transform(x, shift=1.0):
    return x.sign() * (1 + x.abs() / shift).log()


def t_tsdf_head_forward(head, xs, voxel_sizes, targets=None,
                        label_smoothing=1.05, sparse_threshold=(0.99, 0.99, 0.99)):
    """Reference TSDFHead.forward (heads3d.py:112-176), loss_split='pred'."""
    output, losses, mask_surface_pred = {}, {}, []
    decoders = head.heads[0].decoders
    for i, (decoder, x) in enumerate(zip(decoders, xs)):
        tsdf = torch.tanh(decoder(x)) * label_smoothing
        if i > 0:
            prev = F.interpolate(output["vol_%02d_tsdf" % voxel_sizes[i - 1]],
                                 scale_factor=2)
            m = prev.abs() < sparse_threshold[i - 1]
            tsdf = torch.where(m, tsdf, prev.sign() * 0.999)
            mask_surface_pred.append(m)
        output["vol_%02d_tsdf" % voxel_sizes[i]] = tsdf
    if targets is not None:
        for i, vs in enumerate(voxel_sizes):
            key = "vol_%02d_tsdf" % vs
            pred, trgt = output[key], targets[key]
            mask_observed = trgt < 1
            mask_outside = (trgt == 1).all(-1, keepdim=True)
            pred, trgt = t_log_transform(pred), t_log_transform(trgt)
            loss = (pred - trgt).abs()
            wanted = mask_observed | mask_outside
            if i > 0:
                wanted = wanted & mask_surface_pred[i - 1]
            losses[key + "_loss"] = (loss[wanted].mean() if wanted.sum() > 0
                                     else 0 * loss.sum())
    return output, losses


def test_voxel_net_backbone_and_heads_parity(rng):
    """Random-init torch backbone3d + heads ported into flax must reproduce
    the multi-scale volumes and the sparsified masked log-L1 losses."""
    import jax
    from gennerf_tpu.models.backbone3d import EncoderDecoder
    from gennerf_tpu.models.heads import VoxelHeads
    from gennerf_tpu.utils.port_gen_nerf import port_backbone3d, port_voxel_heads
    from gennerf_tpu.utils.port_torch import _merge_checked

    channels, layers_down, layers_up = [4, 8, 16], [1, 2, 2], [2, 2]
    torch.manual_seed(5)
    tb = TEncoderDecoder(channels, layers_down, layers_up)
    th = TVoxelNetHead(channels)
    with torch.no_grad():
        for p in tb.parameters():
            p.normal_(0.0, 0.3)
        for p in th.parameters():
            p.normal_(0.0, 0.3)
        for m in tb.modules():
            if isinstance(m, tnn.BatchNorm3d):
                m.running_mean.normal_(0.0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    tb.eval(), th.eval()

    B, nx, ny, nz = 1, 16, 16, 8
    vol = rng.standard_normal((B, 4, nx, ny, nz)).astype(np.float32)
    vol[:, :, :4] = 0.0  # unobserved region exercises the conditional skip
    voxel_sizes = [16, 8]  # final 8cm, 2 scales, coarse first
    targets_np = {
        "vol_%02d_tsdf" % v: np.clip(
            rng.standard_normal((B, 1, nx // (v // 8), ny // (v // 8),
                                 nz // (v // 8))).astype(np.float32), -1, 1)
        for v in voxel_sizes
    }
    # make some columns fully 'outside' (== 1)
    targets_np["vol_08_tsdf"][:, :, :2] = 1.0

    with torch.no_grad():
        txs = tb(torch.from_numpy(vol))
        tout, tloss = t_tsdf_head_forward(
            th, txs, voxel_sizes, {k: torch.from_numpy(v) for k, v in targets_np.items()}
        )

    fb = EncoderDecoder(channels=channels, layers_down=layers_down,
                        layers_up=layers_up, norm="BN")
    fvars = fb.init(jax.random.PRNGKey(0), jnp.asarray(vol), train=False)
    sd = {"backbone3d." + k: v.detach().numpy() for k, v in tb.state_dict().items()}
    pp, ps = port_backbone3d(sd, layers_down, layers_up)
    params = jax.tree.map(np.asarray, fvars["params"])
    stats = jax.tree.map(np.asarray, fvars["batch_stats"])
    _merge_checked(params, pp)
    _merge_checked(stats, ps)
    fxs = fb.apply({"params": params, "batch_stats": stats}, jnp.asarray(vol),
                   train=False)
    assert len(fxs) == len(txs)  # up-path outputs, coarse -> fine
    for fx, tx in zip(fxs, txs):
        np.testing.assert_allclose(np.asarray(fx), tx.numpy(), rtol=1e-4, atol=1e-4)

    fh = VoxelHeads(channels=channels, voxel_size=0.08)
    hvars = fh.init(jax.random.PRNGKey(0), [jnp.asarray(x.numpy()) for x in txs], None)
    hsd = {"heads3d." + k: v.detach().numpy() for k, v in th.state_dict().items()}
    hp = port_voxel_heads(hsd, n_scales=len(channels) - 1)
    hparams = jax.tree.map(np.asarray, hvars["params"])
    _merge_checked(hparams, hp)
    fout, floss = fh.apply(
        {"params": hparams},
        [jnp.asarray(x.numpy()) for x in txs],
        {k: jnp.asarray(v) for k, v in targets_np.items()},
    )
    for k in tout:
        np.testing.assert_allclose(np.asarray(fout[k]), tout[k].numpy(),
                                   rtol=1e-4, atol=1e-4, err_msg=k)
    for k in tloss:
        np.testing.assert_allclose(float(floss[k]), float(tloss[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
