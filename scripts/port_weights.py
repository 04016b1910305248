#!/usr/bin/env python3
"""Port torch checkpoints into flax pytrees (npz).

Two modes (VERDICT round-1 item #7; reference spatial_encoder.py:62-69
depends on ImageNet-pretrained torchvision backbones):

  backbone mode — a torchvision ResNet state dict (.pth, as downloaded from
    download.pytorch.org/models/resnet{18,34,50}-*.pth) becomes the
    `spatial/resnet` flax subtree:
        python scripts/port_weights.py backbone resnet18.pth out.npz \
            --backbone resnet18 --num-stages 3

  gen_nerf mode — a full reference GenNerf checkpoint (Lightning .ckpt or a
    raw state dict) becomes the pointnet/mlp/head_geo subtrees:
        python scripts/port_weights.py gen_nerf last.ckpt out.npz \
            --n-blocks 5 --pn-blocks 4 --unet-depth 3

The npz stores a flattened tree ("params/<scope>/.../kernel" keys) plus
"batch_stats/..." entries. Training picks it up via
model.encoder.spatial.pretrained_path=<out.npz>.

Offline-environment note: this container has no torchvision and no network,
so no ImageNet checkpoint ships in-repo; the porter itself is parity-tested
against torch-built networks (tests/test_port_torch.py,
tests/test_model_parity.py). On any machine with torchvision:
    import torchvision, torch
    torch.save(torchvision.models.resnet34(weights="DEFAULT").state_dict(),
               "resnet34.pth")
then run backbone mode here.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def flatten_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_tree(flat):
    tree = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def load_torch_state_dict(path):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:  # Lightning checkpoint
        obj = obj["state_dict"]
    return {k: np.asarray(v) for k, v in obj.items() if hasattr(v, "shape")}


def fabricate_resnet_state_dict(backbone: str, seed: int = 0):
    """A torchvision-shaped ResNet state dict with He-init random weights.

    This environment has no network and no torchvision, so no ImageNet
    checkpoint can exist in-repo; `backbone` mode accepts the checkpoint
    path `random:<backbone>` to fabricate one so the FULL graft path
    (state-dict naming -> port_resnet_state_dict -> apply_pretrained_npz
    shape-checked tree merge -> training) is exercised end-to-end in real
    drives. With real ImageNet bytes, only the .pth path changes."""
    from gennerf_tpu.models.resnet import RESNET_SPECS

    rng = np.random.default_rng(seed)
    block_cls, layer_counts = RESNET_SPECS[backbone]
    bottleneck = block_cls.__name__ == "Bottleneck"
    sd = {}

    def conv(name, co, ci, k):
        fan = ci * k * k
        sd[name] = (rng.standard_normal((co, ci, k, k))
                    * np.sqrt(2.0 / fan)).astype(np.float32)

    def bn(prefix, c):
        sd[prefix + ".weight"] = np.ones(c, np.float32)
        sd[prefix + ".bias"] = np.zeros(c, np.float32)
        sd[prefix + ".running_mean"] = np.zeros(c, np.float32)
        sd[prefix + ".running_var"] = np.ones(c, np.float32)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    inplanes = 64
    for stage in range(4):
        planes = 64 * (2 ** stage)
        for b in range(layer_counts[stage]):
            prefix = f"layer{stage + 1}.{b}"
            if bottleneck:
                conv(f"{prefix}.conv1.weight", planes, inplanes, 1)
                bn(f"{prefix}.bn1", planes)
                conv(f"{prefix}.conv2.weight", planes, planes, 3)
                bn(f"{prefix}.bn2", planes)
                conv(f"{prefix}.conv3.weight", planes * 4, planes, 1)
                bn(f"{prefix}.bn3", planes * 4)
                out = planes * 4
            else:
                conv(f"{prefix}.conv1.weight", planes, inplanes, 3)
                bn(f"{prefix}.bn1", planes)
                conv(f"{prefix}.conv2.weight", planes, planes, 3)
                bn(f"{prefix}.bn2", planes)
                out = planes
            # torchvision adds downsample on the first block of a stage when
            # the shape changes (stride 2 in stages 2-4; channel expansion in
            # resnet50's layer1)
            if b == 0 and (stage > 0 or inplanes != out):
                conv(f"{prefix}.downsample.0.weight", out, inplanes, 1)
                bn(f"{prefix}.downsample.1", out)
            inplanes = out
    return sd


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("mode", choices=["backbone", "gen_nerf"])
    parser.add_argument("checkpoint")
    parser.add_argument("output")
    parser.add_argument("--backbone", default="resnet34")
    parser.add_argument("--num-stages", type=int, default=3,
                        help="residual stages kept (num_layers - 1)")
    parser.add_argument("--n-blocks", type=int, default=5, help="mlp blocks")
    parser.add_argument("--pn-blocks", type=int, default=4, help="pointnet blocks")
    parser.add_argument("--unet-depth", type=int, default=3)
    parser.add_argument("--no-unet", action="store_true")
    args = parser.parse_args(argv)

    if args.checkpoint.startswith("random:"):
        if args.mode != "backbone":
            parser.error("random: fabrication is backbone-mode only")
        args.backbone = args.checkpoint.split(":", 1)[1] or args.backbone
        sd = fabricate_resnet_state_dict(args.backbone)
    else:
        sd = load_torch_state_dict(args.checkpoint)

    if args.mode == "backbone":
        from gennerf_tpu.utils.port_torch import port_resnet_state_dict

        # strip a reference-checkpoint prefix if present
        # (GenNerf/VoxelNet store the torchvision model at encoder.model.*)
        for prefix in ("encoder.model.", "model."):
            if any(k.startswith(prefix + "conv1") for k in sd):
                sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
                break
        params, stats = port_resnet_state_dict(sd, args.backbone, args.num_stages)
        flat = flatten_tree({"params": params, "batch_stats": stats})
    else:
        from gennerf_tpu.models.config import GenNerfConfig, config_from_dict
        from gennerf_tpu.utils.port_gen_nerf import port_gen_nerf_params

        cfg = config_from_dict(GenNerfConfig, {
            "mlp": {"n_blocks": args.n_blocks},
            "encoder": {"use_pointnet": True, "pointnet": {
                "n_blocks": args.pn_blocks, "unet": not args.no_unet,
                "unet_depth": args.unet_depth}},
        })
        params = port_gen_nerf_params(sd, cfg)
        flat = flatten_tree({"params": params})

    np.savez(args.output, **flat)
    n_arrays = len(flat)
    n_params = sum(int(np.prod(v.shape)) for v in flat.values())
    print(f"wrote {args.output}: {n_arrays} arrays, {n_params:,} values")
    return args.output


if __name__ == "__main__":
    main()
