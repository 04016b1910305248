"""Port torchvision ResNet weights into the flax ResNetStages tree.

The reference uses ImageNet-pretrained torchvision backbones
(spatial_encoder.py:10-14). torchvision is not installed in this
environment, so the porter accepts either a torchvision model object or a
plain state-dict (e.g. loaded from a checkpoint file with torch) and maps
it onto `gennerf_tpu.models.resnet.ResNetStages` parameter/batch-stats
pytrees. Random init is used when no weights are provided (documented
parity delta).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    """torch conv weight (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.asarray(w).transpose(2, 3, 1, 0)


def port_resnet_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    backbone: str,
    num_stages: int,
) -> Tuple[dict, dict]:
    """Map a torchvision ResNet state dict onto ResNetStages params/batch_stats.

    Args:
        state_dict: name -> array (torch tensors or numpy arrays).
        backbone: 'resnet18' | 'resnet34' | 'resnet50'.
        num_stages: how many residual stages the flax module was built with.

    Returns:
        (params, batch_stats) subtrees for the 'resnet' module scope.
    """
    from ..models.resnet import RESNET_SPECS

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    block_cls, layer_counts = RESNET_SPECS[backbone]
    bottleneck = block_cls.__name__ == "Bottleneck"

    params: dict = {}
    stats: dict = {}

    def put_bn(scope: str, prefix: str):
        params[scope] = {
            "scale": sd[prefix + ".weight"],
            "bias": sd[prefix + ".bias"],
        }
        stats[scope] = {
            "mean": sd[prefix + ".running_mean"],
            "var": sd[prefix + ".running_var"],
        }

    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    put_bn("bn1", "bn1")

    for stage in range(num_stages):
        for b in range(layer_counts[stage]):
            scope = f"layer{stage + 1}_{b}"
            prefix = f"layer{stage + 1}.{b}"
            block: dict = {}
            block_stats: dict = {}
            n_convs = 3 if bottleneck else 2
            for ci in range(1, n_convs + 1):
                block[f"conv{ci}"] = {"kernel": _conv(sd[f"{prefix}.conv{ci}.weight"])}
                block[f"bn{ci}"] = {
                    "scale": sd[f"{prefix}.bn{ci}.weight"],
                    "bias": sd[f"{prefix}.bn{ci}.bias"],
                }
                block_stats[f"bn{ci}"] = {
                    "mean": sd[f"{prefix}.bn{ci}.running_mean"],
                    "var": sd[f"{prefix}.bn{ci}.running_var"],
                }
            if f"{prefix}.downsample.0.weight" in sd:
                block["down_conv"] = {"kernel": _conv(sd[f"{prefix}.downsample.0.weight"])}
                block["down_bn"] = {
                    "scale": sd[f"{prefix}.downsample.1.weight"],
                    "bias": sd[f"{prefix}.downsample.1.bias"],
                }
                block_stats["down_bn"] = {
                    "mean": sd[f"{prefix}.downsample.1.running_mean"],
                    "var": sd[f"{prefix}.downsample.1.running_var"],
                }
            params[scope] = block
            stats[scope] = block_stats
    return params, stats


def load_pretrained_into_variables(variables: dict, state_dict: dict, backbone: str,
                                   num_stages: int, scope_path=("spatial", "resnet")):
    """Return a copy of a model's variables with the ResNet subtree replaced
    by ported weights. `scope_path` locates the ResNetStages submodule."""
    import copy

    params, stats = port_resnet_state_dict(state_dict, backbone, num_stages)
    new_vars = copy.deepcopy(jax_tree_to_dict(variables))

    def descend(tree, path):
        node = tree
        for k in path:
            node = node[k]
        return node

    p_node = descend(new_vars["params"], scope_path[:-1])
    s_node = descend(new_vars["batch_stats"], scope_path[:-1])
    _merge_checked(p_node[scope_path[-1]], params)
    _merge_checked(s_node[scope_path[-1]], stats)
    return new_vars


def apply_pretrained_npz(variables: dict, npz_path: str, scope_path=("spatial", "resnet")):
    """Graft a ported-weights npz (scripts/port_weights.py output) into a
    model's variables under `scope_path`. The npz holds a flattened tree
    with 'params/...' and optional 'batch_stats/...' keys rooted at the
    ResNet subtree."""
    import copy

    import numpy as np

    flat = dict(np.load(npz_path))
    new_vars = copy.deepcopy(jax_tree_to_dict(variables))
    for col in ("params", "batch_stats"):
        sub = {k[len(col) + 1:]: v for k, v in flat.items() if k.startswith(col + "/")}
        if not sub:
            continue
        tree: dict = {}
        for key, v in sub.items():
            node = tree
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = v
        target = new_vars[col]
        for k in scope_path:
            target = target[k]
        _merge_checked(target, tree)
    return new_vars


def jax_tree_to_dict(tree):
    if hasattr(tree, "unfreeze"):
        return tree.unfreeze()
    return dict(tree) if isinstance(tree, dict) else tree


def _merge_checked(dst: dict, src: dict, path: str = ""):
    for k, v in src.items():
        if k not in dst:
            raise KeyError(f"ported key {path}/{k} not in model tree")
        if isinstance(v, dict):
            _merge_checked(dst[k], v, f"{path}/{k}")
        else:
            if tuple(np.shape(dst[k])) != tuple(np.shape(v)):
                raise ValueError(
                    f"shape mismatch at {path}/{k}: model {np.shape(dst[k])} vs ported {np.shape(v)}"
                )
            dst[k] = np.asarray(v, dtype=np.float32)
