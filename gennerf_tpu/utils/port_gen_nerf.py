"""Full-model GenNerf weight porting: reference torch checkpoints <-> flax.

Key naming follows the reference module attribute paths (so a real Lightning
checkpoint's state_dict ports directly):
  pointnet.fc_pos / pointnet.blocks.{i}.fc_0|fc_1|shortcut / pointnet.fc_c /
  pointnet.unet.down_convs.{i}.conv1|conv2 /
  pointnet.unet.up_convs.{i}.upconv|conv1|conv2 / pointnet.unet.conv_final
      (reference src/models/components/pointnet.py:40-52, unet.py:181-205)
  mlp.lin_in / mlp.lin_z.{i} / mlp.blocks.{i}.fc_0|fc_1 / mlp.lin_out
      (reference src/models/components/resnetfc.py:91-118)
  head_geo.fc (reference heads3d.py:28)
  encoder.model.* -> torchvision ResNet (ported by utils/port_torch.py)

Both directions are provided: `port_gen_nerf_params` (torch state_dict ->
flax subtrees) and `export_gen_nerf_params` (flax -> torch state_dict), so
parity can be asserted both ways (tests/test_model_parity.py).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w, np.float32).T


def _dense(sd: Dict, prefix: str, bias: bool = True) -> dict:
    out = {"kernel": _t(sd[prefix + ".weight"])}
    if bias:
        out["bias"] = np.asarray(sd[prefix + ".bias"], np.float32)
    return out


def _conv2d(w) -> np.ndarray:
    """torch Conv2d (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.asarray(w, np.float32).transpose(2, 3, 1, 0)


def _conv_transpose2d(w) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kh, kw) -> flax ConvTranspose
    (kh, kw, I, O); spatial dims flip (torch computes the conv gradient,
    flax a fractionally-strided conv — verified numerically)."""
    return np.asarray(w, np.float32).transpose(2, 3, 0, 1)[::-1, ::-1].copy()


def _block_fc(sd: Dict, prefix: str) -> dict:
    """ResnetBlockFC: fc_0 -> Dense_0, fc_1 -> Dense_1, shortcut -> Dense_2."""
    block = {
        "Dense_0": _dense(sd, prefix + ".fc_0"),
        "Dense_1": _dense(sd, prefix + ".fc_1"),
    }
    if prefix + ".shortcut.weight" in sd:
        block["Dense_2"] = _dense(sd, prefix + ".shortcut", bias=False)
    return block


def port_resnetfc(sd: Dict, n_blocks: int, prefix: str = "mlp",
                  alpha: float = 1.0) -> dict:
    """Reference ResnetFC state dict -> flax ResnetFC params."""
    p: dict = {
        "lin_in": _dense(sd, f"{prefix}.lin_in"),
        "lin_out": _dense(sd, f"{prefix}.lin_out"),
        "alpha": np.asarray(alpha, np.float32),
    }
    for i in range(n_blocks):
        p[f"block_{i}"] = _block_fc(sd, f"{prefix}.blocks.{i}")
        if f"{prefix}.lin_z.{i}.weight" in sd:
            p[f"lin_z_{i}"] = _dense(sd, f"{prefix}.lin_z.{i}")
        if f"{prefix}.scale_z.{i}.weight" in sd:
            p[f"scale_z_{i}"] = _dense(sd, f"{prefix}.scale_z.{i}")
    return p


def port_unet(sd: Dict, depth: int, prefix: str = "pointnet.unet") -> dict:
    p: dict = {}
    for i in range(depth):
        p[f"down_{i}"] = {
            "Conv_0": {"kernel": _conv2d(sd[f"{prefix}.down_convs.{i}.conv1.weight"]),
                       "bias": np.asarray(sd[f"{prefix}.down_convs.{i}.conv1.bias"], np.float32)},
            "Conv_1": {"kernel": _conv2d(sd[f"{prefix}.down_convs.{i}.conv2.weight"]),
                       "bias": np.asarray(sd[f"{prefix}.down_convs.{i}.conv2.bias"], np.float32)},
        }
    for i in range(depth - 1):
        p[f"up_{i}"] = {
            "ConvTranspose_0": {
                "kernel": _conv_transpose2d(sd[f"{prefix}.up_convs.{i}.upconv.weight"]),
                "bias": np.asarray(sd[f"{prefix}.up_convs.{i}.upconv.bias"], np.float32),
            },
            "Conv_0": {"kernel": _conv2d(sd[f"{prefix}.up_convs.{i}.conv1.weight"]),
                       "bias": np.asarray(sd[f"{prefix}.up_convs.{i}.conv1.bias"], np.float32)},
            "Conv_1": {"kernel": _conv2d(sd[f"{prefix}.up_convs.{i}.conv2.weight"]),
                       "bias": np.asarray(sd[f"{prefix}.up_convs.{i}.conv2.bias"], np.float32)},
        }
    p["conv_final"] = {"kernel": _conv2d(sd[f"{prefix}.conv_final.weight"]),
                       "bias": np.asarray(sd[f"{prefix}.conv_final.bias"], np.float32)}
    return p


def port_pointnet(sd: Dict, n_blocks: int, use_unet: bool, unet_depth: int,
                  prefix: str = "pointnet") -> dict:
    p: dict = {
        "fc_pos": _dense(sd, f"{prefix}.fc_pos"),
        "fc_c": _dense(sd, f"{prefix}.fc_c"),
    }
    for i in range(n_blocks):
        p[f"block_{i}"] = _block_fc(sd, f"{prefix}.blocks.{i}")
    if use_unet:
        p["unet"] = port_unet(sd, unet_depth, prefix=f"{prefix}.unet")
    return p


def port_gen_nerf_params(sd: Dict, cfg) -> dict:
    """Reference GenNerf state_dict -> flax params subtrees (pointnet-path
    modules; the spatial ResNet ports via utils/port_torch.py)."""
    params: dict = {}
    enc = cfg.encoder
    if enc.use_pointnet:
        params["pointnet"] = port_pointnet(
            sd, enc.pointnet.n_blocks, enc.pointnet.unet, enc.pointnet.unet_depth
        )
        if "merger.conv.weight" in sd:
            params["merger"] = {"merge_conv": {
                "kernel": _conv2d(sd["merger.conv.weight"]),
                "bias": np.asarray(sd["merger.conv.bias"], np.float32),
            }}
    params["mlp"] = port_resnetfc(sd, cfg.mlp.n_blocks, alpha=cfg.mlp.alpha)
    params["head_geo"] = {"Dense_0": _dense(sd, "head_geo.fc")}
    return params


# ---------------------------------------------------------------------------
# reverse direction: flax -> torch state_dict
# ---------------------------------------------------------------------------

def _exp_dense(out: Dict, prefix: str, p: dict):
    out[prefix + ".weight"] = _t(p["kernel"])
    if "bias" in p:
        out[prefix + ".bias"] = np.asarray(p["bias"], np.float32)


def _exp_block_fc(out: Dict, prefix: str, p: dict):
    _exp_dense(out, prefix + ".fc_0", p["Dense_0"])
    _exp_dense(out, prefix + ".fc_1", p["Dense_1"])
    if "Dense_2" in p:
        _exp_dense(out, prefix + ".shortcut", p["Dense_2"])


def export_gen_nerf_params(params: dict, cfg) -> Dict[str, np.ndarray]:
    """flax GenNerf params -> reference-named torch state_dict (numpy)."""
    out: Dict[str, np.ndarray] = {}
    if "pointnet" in params:
        pn = params["pointnet"]
        _exp_dense(out, "pointnet.fc_pos", pn["fc_pos"])
        _exp_dense(out, "pointnet.fc_c", pn["fc_c"])
        for i in range(cfg.encoder.pointnet.n_blocks):
            _exp_block_fc(out, f"pointnet.blocks.{i}", pn[f"block_{i}"])
        if "unet" in pn:
            un = pn["unet"]
            depth = cfg.encoder.pointnet.unet_depth
            for i in range(depth):
                d = un[f"down_{i}"]
                out[f"pointnet.unet.down_convs.{i}.conv1.weight"] = np.asarray(d["Conv_0"]["kernel"]).transpose(3, 2, 0, 1)
                out[f"pointnet.unet.down_convs.{i}.conv1.bias"] = np.asarray(d["Conv_0"]["bias"])
                out[f"pointnet.unet.down_convs.{i}.conv2.weight"] = np.asarray(d["Conv_1"]["kernel"]).transpose(3, 2, 0, 1)
                out[f"pointnet.unet.down_convs.{i}.conv2.bias"] = np.asarray(d["Conv_1"]["bias"])
            for i in range(depth - 1):
                u = un[f"up_{i}"]
                k = np.asarray(u["ConvTranspose_0"]["kernel"])[::-1, ::-1]
                out[f"pointnet.unet.up_convs.{i}.upconv.weight"] = k.transpose(2, 3, 0, 1).copy()
                out[f"pointnet.unet.up_convs.{i}.upconv.bias"] = np.asarray(u["ConvTranspose_0"]["bias"])
                out[f"pointnet.unet.up_convs.{i}.conv1.weight"] = np.asarray(u["Conv_0"]["kernel"]).transpose(3, 2, 0, 1)
                out[f"pointnet.unet.up_convs.{i}.conv1.bias"] = np.asarray(u["Conv_0"]["bias"])
                out[f"pointnet.unet.up_convs.{i}.conv2.weight"] = np.asarray(u["Conv_1"]["kernel"]).transpose(3, 2, 0, 1)
                out[f"pointnet.unet.up_convs.{i}.conv2.bias"] = np.asarray(u["Conv_1"]["bias"])
            out["pointnet.unet.conv_final.weight"] = np.asarray(un["conv_final"]["kernel"]).transpose(3, 2, 0, 1)
            out["pointnet.unet.conv_final.bias"] = np.asarray(un["conv_final"]["bias"])
    mlp = params["mlp"]
    _exp_dense(out, "mlp.lin_in", mlp["lin_in"])
    _exp_dense(out, "mlp.lin_out", mlp["lin_out"])
    for i in range(cfg.mlp.n_blocks):
        _exp_block_fc(out, f"mlp.blocks.{i}", mlp[f"block_{i}"])
        if f"lin_z_{i}" in mlp:
            _exp_dense(out, f"mlp.lin_z.{i}", mlp[f"lin_z_{i}"])
    _exp_dense(out, "head_geo.fc", params["head_geo"]["Dense_0"])
    return out


# ---------------------------------------------------------------------------
# VoxelNet: backbone3d EncoderDecoder + VoxelHeads
# ---------------------------------------------------------------------------

def _conv3d(w) -> np.ndarray:
    """torch Conv3d (O, I, kd, kh, kw) -> flax (kd, kh, kw, I, O)."""
    return np.asarray(w, np.float32).transpose(2, 3, 4, 1, 0)


def _bn(sd: Dict, prefix: str):
    params = {"scale": np.asarray(sd[prefix + ".weight"], np.float32),
              "bias": np.asarray(sd[prefix + ".bias"], np.float32)}
    stats = {"mean": np.asarray(sd[prefix + ".running_mean"], np.float32),
             "var": np.asarray(sd[prefix + ".running_var"], np.float32)}
    return {"BatchNorm_0": params}, {"BatchNorm_0": stats}


def _block3d(sd: Dict, prefix: str):
    """Reference BasicBlock3d (backbone3d.py:56-95) -> flax BasicBlock3d."""
    p: dict = {"conv1": {"kernel": _conv3d(sd[prefix + ".conv1.weight"])},
               "conv2": {"kernel": _conv3d(sd[prefix + ".conv2.weight"])}}
    s: dict = {}
    p["bn1"], s["bn1"] = _bn(sd, prefix + ".bn1")
    p["bn2"], s["bn2"] = _bn(sd, prefix + ".bn2")
    if prefix + ".downsample.weight" in sd:
        p["down"] = {"kernel": _conv3d(sd[prefix + ".downsample.weight"])}
    return p, s


def port_backbone3d(sd: Dict, layers_down, layers_up, prefix: str = "backbone3d"):
    """Reference EncoderDecoder state dict (backbone3d.py:134-208 module
    names: layers_down.{i} Sequential, proj.{i} [already reversed],
    layers_up_conv.{i}, layers_up_res.{i}) -> flax params/batch_stats."""
    params: dict = {}
    stats: dict = {}
    for j in range(layers_down[0]):
        p, s = _block3d(sd, f"{prefix}.layers_down.0.{j}")
        params[f"down0_b{j}"] = p
        stats[f"down0_b{j}"] = s
    for i in range(1, len(layers_down)):
        # Sequential: [0]=strided Conv3d, [1]=norm, [2]=Dropout, [3]=ReLU,
        # [4+j]=BasicBlock3d
        params[f"down{i}_conv"] = {"kernel": _conv3d(sd[f"{prefix}.layers_down.{i}.0.weight"])}
        params[f"down{i}_norm"], stats[f"down{i}_norm"] = _bn(sd, f"{prefix}.layers_down.{i}.1")
        for j in range(layers_down[i]):
            p, s = _block3d(sd, f"{prefix}.layers_down.{i}.{4 + j}")
            params[f"down{i}_b{j}"] = p
            stats[f"down{i}_b{j}"] = s
    for i in range(len(layers_up)):
        params[f"up{i}_conv"] = {"kernel": _conv3d(sd[f"{prefix}.layers_up_conv.{i}.weight"])}
        proj_p = {"conv": {"kernel": _conv3d(sd[f"{prefix}.proj.{i}.conv.weight"])}}
        proj_p["norm"], proj_s = _bn(sd, f"{prefix}.proj.{i}.norm")
        params[f"proj{i}"] = proj_p
        stats[f"proj{i}"] = {"norm": proj_s}
        for j in range(layers_up[i]):
            p, s = _block3d(sd, f"{prefix}.layers_up_res.{i}.{j}")
            params[f"up{i}_b{j}"] = p
            stats[f"up{i}_b{j}"] = s
    return params, stats


def port_voxel_heads(sd: Dict, n_scales: int, prefix: str = "heads3d"):
    """Reference VoxelHeads/TSDFHead decoders (heads3d.py:101-110:
    heads.0.decoders.{i} = Conv3d(C, 1, 1, bias=False)) -> flax
    tsdf_head/decoder_{i} Dense kernels."""
    tsdf_head = {}
    for i in range(n_scales):
        w = np.asarray(sd[f"{prefix}.heads.0.decoders.{i}.weight"], np.float32)
        tsdf_head[f"decoder_{i}"] = {"kernel": w.reshape(w.shape[:2]).T}  # (C, 1)
    return {"tsdf_head": tsdf_head}


def merge_params(model_params: dict, ported: dict) -> dict:
    """Replace subtrees of a flax param tree with ported values, checking
    key/shape agreement (shares utils/port_torch semantics)."""
    from .port_torch import _merge_checked, jax_tree_to_dict
    import copy

    new = copy.deepcopy(jax_tree_to_dict(model_params))
    _merge_checked(new, ported)
    return new
